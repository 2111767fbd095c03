"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding/pjit tests need multiple devices; real multi-chip TPU hardware is
not available in CI, so tests force the CPU backend with 8 virtual devices
(the standard JAX testing recipe). Must run before jax initializes.
"""

import os

# The harness exports JAX_PLATFORMS=axon (remote single-chip TPU tunnel) and
# pre-imports jax via sitecustomize, so both the env var and the already-read
# config must be overridden to keep tests on the local CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# LevelGen-style resets compile large graphs (~2 min); cache them across
# test processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import sys

REFERENCE_PATH = "/root/reference"


def add_reference_to_path():
    """Make the reference Minigrid importable as a parity oracle."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

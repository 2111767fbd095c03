"""minigrid_tpu — a TPU-native gridworld RL framework.

A from-scratch JAX/XLA re-design with the capabilities of the reference
Minigrid library (mounted read-only at /root/reference): the same 178-entry
environment catalog, observation encoding, wrappers, BabyAI language stack,
WFC procedural generation and tooling — but with environment state as pytrees
of arrays, transitions as branchless jit/vmap kernels, and scaling via
``jax.sharding`` meshes instead of Python object graphs.
"""

from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.mission_space import MissionSpace
from minigrid_tpu.core.types import EnvParams, EnvState
from minigrid_tpu.envs.base import (
    LayoutPool,
    make_layout_pool,
    refresh_layout_pool,
)
from minigrid_tpu.registry import make, register, registered_ids
from minigrid_tpu import register_envs as _register_envs

_register_envs.register_all()

__version__ = "0.1.0"

__all__ = [
    "Actions",
    "EnvParams",
    "EnvState",
    "LayoutPool",
    "MissionSpace",
    "make",
    "make_layout_pool",
    "refresh_layout_pool",
    "register",
    "registered_ids",
]

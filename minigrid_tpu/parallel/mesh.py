"""Device mesh + sharding layout for the env/learner pipeline.

The reference has no distributed runtime at all (SURVEY.md §2: the only
"parallelism" is a Python loop in SyncVectorEnv). The TPU-native scaling
story: a 2-D ``jax.sharding.Mesh`` with a ``data`` axis (batched env states
and rollout tensors shard their leading batch dimension here — the DP analog)
and a ``model`` axis (dense kernels and embeddings column-shard here — TP).
XLA GSPMD inserts the all-gathers/reduce-scatters over ICI; nothing in the
step path communicates at all, so env throughput scales linearly with chips.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, model_parallel: int | None = None) -> Mesh:
    """2-D (data, model) mesh. ``model_parallel`` defaults to 1 (pure DP):
    the flagship ActorCritic is ~1.3 MB of parameters — replicating it is
    free, while TP=2 inserts per-layer activation collectives into every
    minibatch forward/backward. Measured on the virtual 8-device mesh
    (RESULTS.md round 4): the mp=2 train step runs ~20-30% slower than
    mp=1 at equal device counts, with no memory need to shard. Pass
    model_parallel>1 explicitly for models that outgrow a chip."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    if model_parallel is None:
        model_parallel = 1
    assert n % model_parallel == 0
    grid = np.array(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def param_spec(path: tuple, leaf) -> PS:
    """Tensor-parallel layout for ActorCritic params.

    Hidden-dim kernel columns and embedding features shard over ``model``;
    the small policy/value heads and all biases replicate.
    """
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(str(n) for n in names)
    if "policy" in joined or "value" in joined:
        return PS()
    if leaf.ndim == 2:  # Dense kernel (in, out) or Embed (vocab, dim)
        return PS(None, MODEL_AXIS)
    if leaf.ndim == 1 and leaf.shape[0] >= 64:  # hidden-sized bias
        return PS(MODEL_AXIS)
    return PS()


def shard_params(mesh: Mesh, params):
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, NamedSharding(mesh, param_spec(path, x))),
        params,
    )


def param_shardings(mesh: Mesh, params):
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, param_spec(path, x)), params
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PS(DATA_AXIS))


def shard_batch(mesh: Mesh, tree):
    """Shard every leaf's leading (batch) axis over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

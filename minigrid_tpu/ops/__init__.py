"""TPU fast-path ops (Pallas kernels).

``fused_step.fused_rollout`` runs a whole rollout chunk of step+obs with
each 128-env block's state resident in VMEM, envs on the lane dimension —
bit-exact against the jit/vmap path (tests/test_fused_step.py) and within
~10% of it on chip (185-191M vs 213M env-steps/s on DoorKey-8x8; see the
module docstring for why the XLA path's axis-separated window read wins).
Kept as a validated alternative and as the scaffold for kernels XLA cannot
express; the production hot path remains ``jit(scan(...))`` (bench.py).
"""

from minigrid_tpu.ops.fused_step import fused_rollout, require_core_dynamics

__all__ = ["fused_rollout", "require_core_dynamics"]

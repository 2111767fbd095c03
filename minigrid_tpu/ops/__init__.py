"""TPU kernel fast paths (Pallas).

These kernels implement the same dynamics/observation math as the reference
implementations in :mod:`minigrid_tpu.core`, fused so that batched rollouts
keep the entire environment state resident in VMEM across many steps instead
of round-tripping HBM once per step like a ``lax.scan`` body does.
"""

from minigrid_tpu.ops.fused_rollout import fused_rollout, supports_fused_rollout

__all__ = ["fused_rollout", "supports_fused_rollout"]

"""TPU fast-path ops.

A Pallas fused-rollout kernel (state resident in VMEM across a whole rollout
chunk) was prototyped here in round 1 but hit a Mosaic internal compiler
error on real TPU hardware and never beat the XLA path, so it was removed:
``jit(scan(vmap(step)))`` (bench.py) already keeps the hot loop on-device at
>100M env-steps/s, because XLA fuses the branchless step/obs math into a few
kernels on its own. If a hand-written kernel returns, it must prove a
hardware win over bench.py first.
"""

__all__: list[str] = []

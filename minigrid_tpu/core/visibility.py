"""Occlusion / field-of-view kernel.

The reference computes visibility with a sequential two-pass sweep over the
rotated view grid (``minigrid/core/grid.py:291-328``): rows bottom-to-top; in
each row a left-to-right pass then a right-to-left pass propagate visibility
sideways and seed the row above. Cell-by-cell that is O(V^2) Python.

Here each row of V cells is packed into the low bits of ONE int32, and a
row pass becomes Kogge-Stone carry propagation: visibility spreads along a
row through runs of transparent cells, and "reach within distance 2^k" masks
compose by doubling, so a full left-to-right pass is 3 shift-and-or steps
for V <= 8 (log2(V) in general). The whole (V, V) flood costs ~20 integer
ops per row on scalars — under ``vmap`` these are (batch,) int32 vector ops
the VPU executes in lockstep across thousands of envs, with no (V, V)
intermediate matrices at all. Only the V-row bottom-to-top recurrence remains
sequential, unrolled (V is static). The result is bit-identical to the
reference sweep (validated exhaustively in tests/test_visibility.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _row_pass_bits(seed, t, V: int, full: int):
    """One row's two sweeps on bit-packed masks.

    seed: int32 scalar, bit x set = cell x seeded visible before the passes.
    t:    int32 scalar, bit x set = cell x transparent (``see_behind``).
    Returns (row visibility mask, seeds for the row above), both packed.
    """
    # pass 1, ascending x: m[i] = seed[i] | (m[i-1] & t[i-1]); closure by
    # doubling with T_k[i] = all-transparent(t[i-2^k .. i-1])
    m = seed
    T = (t << 1) & full
    shift = 1
    while shift < V:
        m |= (m << shift) & T
        T &= (T << shift) & full
        shift *= 2

    m1 = m
    # pass 2, descending x: m[i] |= m[i+1] & t[i+1]
    U = t >> 1
    shift = 1
    while shift < V:
        m |= (m >> shift) & U
        U &= U >> shift
        shift *= 2
    m2 = m

    # seeds for the row above (grid.py:316-325): a visited transparent cell
    # marks the cell above it and that cell's left/right neighbor
    e = m1 & t & (full >> 1)  # pass-1 cells with x < V-1
    up1 = e | ((e << 1) & full)
    f = m2 & t & (full ^ 1)  # pass-2 cells with x >= 1
    up2 = f | (f >> 1)
    return m2, up1 | up2


def process_vis(transparent: jax.Array, agent_x: int) -> jax.Array:
    """Visibility mask for a view grid already in the agent frame.

    transparent: (V, V) bool, indexed [x, y]; the agent sits at
    (agent_x, V-1) looking towards y=0 (reference gen_obs_grid places it at
    (view//2, view-1), minigrid_env.py:617-619).
    Returns (V, V) bool visibility mask.
    """
    V = transparent.shape[0]
    full = (1 << V) - 1
    # bit-pack each row into one int32; statically unrolled shift-or chain
    # (a masked-sum reduction here would split the fused step kernel —
    # see core/obs.py docstring)
    ti = transparent.astype(jnp.int32)
    tcols = ti[0]
    for x in range(1, V):
        tcols = tcols | (ti[x] << x)  # (V,)

    seed = jnp.int32(1 << agent_x)
    # rows j = V-1 .. 0; V is small and static, so the recurrence unrolls
    # into straight-line integer code
    rows = []
    for j in range(V - 1, -1, -1):
        m_row, seed = _row_pass_bits(seed, tcols[j], V, full)
        rows.append(m_row)
    packed = jnp.stack(rows[::-1])  # (V,) — entry j = row y=j
    bits = jnp.arange(V, dtype=jnp.int32)[:, None]
    return ((packed[None, :] >> bits) & 1).astype(bool)

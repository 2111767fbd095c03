"""Occlusion / field-of-view kernel.

The reference computes visibility with a sequential two-pass sweep over the
rotated view grid (``minigrid/core/grid.py:291-328``): rows bottom-to-top; in
each row a left-to-right pass then a right-to-left pass propagate visibility
sideways and seed the row above. Cell-by-cell that is O(V^2) Python; here the
same function is computed with **per-row boolean reachability matrices**:

Within one pass, visibility spreads along a row through runs of transparent
cells, so "cell k (visible) reaches cell i" is exactly "no opaque cell lies
strictly between k and i". With ``Copq[i] = #opaque cells before i`` that is
``Copq[i] == Copq[k]`` — an O(V^2) dense boolean mask computed from one
cumsum. Each pass then becomes a single masked ``any`` reduction (a tiny
(V,V) x (V,) contraction that XLA fuses onto the VPU), and only the V-row
bottom-to-top recurrence remains sequential (a ``lax.scan`` of length V).
The result is bit-identical to the reference sweep (validated exhaustively in
tests/test_visibility.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _row_pass(seed_row: jax.Array, trans_row: jax.Array):
    """Process one row; returns (final row mask, seeds for the row above).

    seed_row:  (V,) bool — mask state of this row before its two passes.
    trans_row: (V,) bool — per-cell transparency (``see_behind``).
    """
    V = seed_row.shape[0]
    idx = jnp.arange(V)
    opaque = ~trans_row

    # exclusive / inclusive running counts of opaque cells
    c_excl = jnp.cumsum(opaque) - opaque.astype(jnp.int32)
    c_incl = jnp.cumsum(opaque)

    le = idx[:, None] <= idx[None, :]  # k <= i
    # pass 1 (left-to-right): k reaches i>k iff trans[k..i-1] all True
    chain_r = le & (c_excl[None, :] == c_excl[:, None])
    m1 = jnp.any(chain_r & seed_row[:, None], axis=0)

    # visited cells of pass 1 (i < V-1) spread up-left and up-right diagonals
    e = m1 & trans_row & (idx < V - 1)
    up1 = e | jnp.concatenate([e[:1] & False, e[:-1]])

    # pass 2 (right-to-left): k reaches i<k iff trans[i+1..k] all True
    chain_l = le.T & (c_incl[:, None] == c_incl[None, :])
    m2 = jnp.any(chain_l & m1[:, None], axis=0)

    f = m2 & trans_row & (idx >= 1)
    up2 = f | jnp.concatenate([f[1:], f[:1] & False])

    return m2, up1 | up2


def process_vis(transparent: jax.Array, agent_x: int) -> jax.Array:
    """Visibility mask for a view grid already in the agent frame.

    transparent: (V, V) bool, indexed [x, y]; the agent sits at
    (agent_x, V-1) looking towards y=0 (reference gen_obs_grid places it at
    (view//2, view-1), minigrid_env.py:617-619).
    Returns (V, V) bool visibility mask.
    """
    V = transparent.shape[0]
    seed = jnp.zeros((V,), bool).at[agent_x].set(True)

    # iterate rows j = V-1 .. 0; row j's passes seed row j-1. V is small
    # and static, so the row recurrence is unrolled — XLA fuses the whole
    # mask computation into straight-line vector code (no loop overhead
    # under vmap over thousands of envs).
    rows = []
    for j in range(V - 1, -1, -1):
        m_row, seed = _row_pass(seed, transparent[:, j])
        rows.append(m_row)
    return jnp.stack(rows[::-1], axis=1)

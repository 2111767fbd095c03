"""Egocentric partial-observation kernel.

The reference builds the agent view by materializing a sub-``Grid`` and
rotating it 1-4 times (``minigrid_env.py:597-632`` calling ``grid.slice`` and
``grid.rotate_left``, grid.py:110-143). Here the slice+rotate collapse into a
single read: for each view cell (vx, vy) the world coordinate is the affine
map ``top_left + right_vec*vx - dir_vec*vy`` (the inverse of the reference's
``get_view_coords``, minigrid_env.py:426-451), so one indexed read produces
the already-rotated view. Out-of-bounds reads yield walls (grid.py:139).
Occlusion comes from :mod:`minigrid_tpu.core.visibility`.

The read itself is NOT a gather: per-env dynamic-index gathers serialize on
TPU (measured ~200x slower than the arithmetic around them). Instead the grid
is packed to one int32 per cell (grid.pack_cells) and each view cell is read
as a one-hot compare + masked sum over the flattened grid — a (V*V, W*H)
elementwise contraction the VPU chews through in lockstep across thousands of
vmapped envs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.types import EnvParams, EnvState
from minigrid_tpu.core.visibility import process_vis


def view_world_coords(params: EnvParams, agent_pos, agent_dir):
    """(V, V) world x/y indices for every view cell, agent frame."""
    V = params.view_size
    hs = V // 2
    # DIR_TO_VEC lookup as arithmetic (avoids a per-env table gather):
    # dirs 0..3 -> (1,0) (0,1) (-1,0) (0,-1)  (constants.py DIR_TO_VEC)
    d = jnp.asarray(agent_dir, jnp.int32)
    f = jnp.stack(
        [
            (d == 0).astype(jnp.int32) - (d == 2),
            (d == 1).astype(jnp.int32) - (d == 3),
        ]
    )
    r = jnp.stack([-f[1], f[0]])                        # right vec
    top_left = agent_pos + f * (V - 1) - r * hs
    vx = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0)
    vy = jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)
    wx = top_left[0] + r[0] * vx - f[0] * vy
    wy = top_left[1] + r[1] * vx - f[1] * vy
    return wx, wy


def gen_obs_grid(params: EnvParams, state: EnvState):
    """View cells (V, V, 5) + visibility mask (V, V), both agent-frame."""
    V = params.view_size
    W, H = params.width, params.height
    hs = V // 2
    # Axis-separated window read. The forward/right vectors are always unit
    # axis vectors, so wx depends on exactly one of (vx, vy) and wy on the
    # other: the rotated view is an axis-aligned window followed by a
    # transpose for dirs 0/2. That factors the (V*V, W*H) one-hot
    # contraction into two ~(V, W) ones — ~4x fewer lane-ops.
    d = jnp.asarray(state.agent_dir, jnp.int32)
    fx = (d == 0).astype(jnp.int32) - (d == 2)
    fy = (d == 1).astype(jnp.int32) - (d == 3)
    rx, ry = -fy, fx
    pos = state.agent_pos
    tlx = pos[0] + fx * (V - 1) - rx * hs
    tly = pos[1] + fy * (V - 1) - ry * hs
    m = jnp.arange(V, dtype=jnp.int32)
    wxm = tlx + (rx - fx) * m          # world x as a function of one index
    wyn = tly + (ry - fy) * m          # world y as a function of the other
    ox = wxm[:, None] == jnp.arange(W, dtype=jnp.int32)   # (V, W)
    oy = wyn[:, None] == jnp.arange(H, dtype=jnp.int32)   # (V, H)
    packed = G.pack_cells(state.grid)                      # (W, H)
    t = jnp.sum(jnp.where(ox[:, :, None], packed[None], 0), axis=1)  # (V, H)
    u = jnp.sum(jnp.where(oy[None], t[:, None, :], 0), axis=2)       # (V, V)
    inb = (jnp.any(ox, axis=1)[:, None]) & (jnp.any(oy, axis=1)[None])
    u = jnp.where(inb, u, G.WALL_PACKED)
    # dirs 1/3: u is already [vx, vy]; dirs 0/2: indices swap
    swap = (d == 0) | (d == 2)
    cells = G.unpack_cells(jnp.where(swap, u.T, u))

    if params.see_through_walls:
        vis = jnp.ones((V, V), bool)
    else:
        vis = process_vis(G.transparent_mask(cells), V // 2)

    # carried-object overlay at the agent cell (minigrid_env.py:626-630);
    # carrying == EMPTY_CELL reproduces the reference's set-to-None.
    cells = cells.at[V // 2, V - 1].set(state.carrying)
    return cells, vis


def gen_obs(params: EnvParams, state: EnvState):
    """Observation dict {image, direction, mission} (minigrid_env.py:634-650).

    ``mission`` is the tokenized instruction (int32 ids) rather than a Python
    string — realize text host-side with core.mission.detokenize.
    """
    cells, vis = gen_obs_grid(params, state)
    return {
        "image": G.encode(cells, vis),
        "direction": state.agent_dir,
        "mission": state.mission,
    }

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
is packed to one int32 per cell (grid.pack_cells) and the window is read by
one-hot compares, statically unrolled over the grid's W columns then H rows
as select-accumulate chains. Unrolling matters: written as masked-sum
reductions, each sum became its own XLA fusion whose operands round-tripped
HBM every scan step; as straight-line elementwise ops the whole step+obs
body fuses into a handful of kernels (measured +20% end-to-end env-steps/s
on TPU, bit-identical output).
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


def _view_packed(params: EnvParams, state: EnvState):
    """Packed view window (V, V) int32 + visibility, both agent-frame,
    WITHOUT the carried-object overlay (visibility is computed on the raw
    slice, grid.py:291; the overlay happens afterwards).

    Axis-separated window read: the forward/right vectors are always unit
    axis vectors, so wx depends on exactly one of (vx, vy) and wy on the
    other — the rotated view is an axis-aligned window followed by a
    transpose for dirs 0/2. That factors the (V*V, W*H) one-hot contraction
    into two ~(V, W) ones, statically unrolled (see module docstring).
    """
    V = params.view_size
    W, H = params.width, params.height
    hs = V // 2
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
    packed = G.pack_cells(state.grid)                      # (W, H)
    # statically unrolled select-accumulate (see module docstring)
    t = jnp.zeros((V, H), jnp.int32)
    for x in range(W):
        t = t + jnp.where((wxm == x)[:, None], packed[x][None, :], 0)
    u = jnp.zeros((V, V), jnp.int32)
    for y in range(H):
        u = u + jnp.where((wyn == y)[None, :], t[:, y][:, None], 0)
    inb = ((wxm >= 0) & (wxm < W))[:, None] & \
        ((wyn >= 0) & (wyn < H))[None, :]
    u = jnp.where(inb, u, G.WALL_PACKED)
    # dirs 1/3: u is already [vx, vy]; dirs 0/2: indices swap
    swap = (d == 0) | (d == 2)
    u = jnp.where(swap, u.T, u)

    if params.see_through_walls:
        vis = jnp.ones((V, V), bool)
    else:
        # per-cell see_behind straight from the packed type/state bits
        typ = u & 15
        transparent = ~((typ == C.WALL)
                        | ((typ == C.DOOR) & ((u >> 7) & 3 != C.OPEN)))
        vis = process_vis(transparent, V // 2)
    return u, vis


def _overlay_carried(params: EnvParams, state: EnvState, u: jax.Array):
    """Carried-object overlay at the agent cell (minigrid_env.py:626-630),
    in the packed domain; carrying == EMPTY_CELL reproduces the reference's
    set-to-None. Static index mask instead of a scatter so it fuses."""
    V = params.view_size
    om = jnp.zeros((V, V), bool).at[V // 2, V - 1].set(True)
    return jnp.where(om, G.pack_cells(state.carrying), u)


def gen_obs_grid(params: EnvParams, state: EnvState):
    """View cells (V, V, 5) + visibility mask (V, V), both agent-frame."""
    u, vis = _view_packed(params, state)
    return G.unpack_cells(_overlay_carried(params, state, u)), vis


def gen_obs(params: EnvParams, state: EnvState):
    """Observation dict {image, direction, mission} (minigrid_env.py:634-650).

    ``mission`` is the tokenized instruction (int32 ids) rather than a Python
    string — realize text host-side with core.mission.detokenize. The image
    channels are extracted directly from the packed view (no intermediate
    (V, V, 5) materialization); invisible cells encode as (0, 0, 0) = unseen
    exactly like the reference's zero-initialized encode array.
    """
    u, vis = _view_packed(params, state)
    u = _overlay_carried(params, state, u)
    u = jnp.where(vis, u, 0)
    if params.packed_obs:
        # packed mode: one int32 lane per cell, the 9 observation bits
        # (type|color<<4|state<<7) only — contents bits are never observable
        # (the reference encodes boxes opaquely, world_object.py:254-258).
        # Invisible cells are 0 = unseen, identical to the image path.
        return {
            "packed": u & 0x1FF,
            "direction": state.agent_dir,
            "mission": state.mission,
        }
    img = jnp.stack([u & 15, (u >> 4) & 7, (u >> 7) & 3],
                    axis=-1).astype(jnp.uint8)
    return {
        "image": img,
        "direction": state.agent_dir,
        "mission": state.mission,
    }

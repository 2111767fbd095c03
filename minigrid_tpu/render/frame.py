"""Frame composition: full-grid and agent-POV RGB rendering.

The reference renders frames tile-by-tile in Python with a memo dict
(``minigrid/core/grid.py:200-242``, ``minigrid_env.py:652-739``); here a
frame is one gather from the precomputed atlas followed by a reshape —
jittable, vmappable, and bit-identical to the reference output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.obs import gen_obs_grid, view_world_coords
from minigrid_tpu.core.types import EnvParams, EnvState
from minigrid_tpu.render.tiles import AGENT_NONE, get_atlas


def compose_frame(cells3, agent_pos, agent_dir, highlight_mask, tile_size: int):
    """cells3: (W, H, 3) symbolic grid; returns (H*T, W*T, 3) uint8.

    agent_pos of (-1, -1) renders no agent (reference passes agent_dir=None
    for every non-agent cell, grid.py:229-234).
    """
    atlas = jnp.asarray(get_atlas(tile_size))
    W, H = cells3.shape[:2]
    aid = (
        cells3[..., 0].astype(jnp.int32) * 18
        + cells3[..., 1].astype(jnp.int32) * 3
        + cells3[..., 2].astype(jnp.int32)
    )
    xs = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
    at_agent = (xs == agent_pos[0]) & (ys == agent_pos[1])
    slot = jnp.where(at_agent, agent_dir, AGENT_NONE)
    hl = highlight_mask.astype(jnp.int32)

    tiles = atlas[aid, slot, hl]                      # (W, H, T, T, 3)
    # tile (x, y) occupies rows y*T:(y+1)*T, cols x*T:(x+1)*T (grid.py:236-240)
    img = jnp.transpose(tiles, (1, 2, 0, 3, 4))       # (H, T, W, T, 3)
    T = tile_size
    return img.reshape(H * T, W * T, 3)


def get_full_render(params: EnvParams, state: EnvState, highlight: bool = True,
                    tile_size: int = C.TILE_PIXELS):
    """Whole-grid frame with the agent's view cone highlighted
    (minigrid_env.py:668-714)."""
    if highlight:
        _, vis = gen_obs_grid(params, state)
        wx, wy = view_world_coords(params, state.agent_pos, state.agent_dir)
        inb = (wx >= 0) & (wx < params.width) & (wy >= 0) & (wy < params.height)
        mark = vis & inb
        # dense membership, not a bool scatter-max (grid.py onehot_set
        # rationale): (W, H) x view-cells compare, ~30k lanes
        xs = jnp.arange(params.width)[:, None, None]
        ys = jnp.arange(params.height)[None, :, None]
        highlight_mask = ((xs == wx.reshape(-1))
                          & (ys == wy.reshape(-1))
                          & mark.reshape(-1)).any(-1)
    else:
        highlight_mask = jnp.zeros((params.width, params.height), bool)
    return compose_frame(state.grid[..., :3], state.agent_pos, state.agent_dir,
                         highlight_mask, tile_size)


def get_pov_render(params: EnvParams, state: EnvState,
                   tile_size: int = C.TILE_PIXELS):
    """Agent's point-of-view frame (minigrid_env.py:652-666): visible cells
    highlighted, occluded cells cleared, agent at bottom-center facing up."""
    cells, vis = gen_obs_grid(params, state)
    cells3 = jnp.where(vis[..., None], cells[..., :3],
                       jnp.asarray(C.EMPTY_CELL[:3]))
    V = params.view_size
    agent_pos = jnp.asarray([V // 2, V - 1])
    return compose_frame(cells3, agent_pos, jnp.asarray(3), vis, tile_size)


def get_frame(params: EnvParams, state: EnvState, highlight: bool = True,
              tile_size: int = C.TILE_PIXELS, agent_pov: bool = False):
    """The reference ``get_frame`` (minigrid_env.py:716-739)."""
    if agent_pov:
        return get_pov_render(params, state, tile_size)
    return get_full_render(params, state, highlight, tile_size)

"""Jittable object/agent placement.

The reference places objects by unbounded rejection sampling over a rectangle
(``minigrid/minigrid_env.py:313-372``). The limit distribution of that loop is
uniform over the acceptable cells, so the TPU-native equivalent draws one
categorical sample over the acceptance mask — fixed shapes, a single RNG draw,
no data-dependent loop. ``reject_fn`` becomes an explicit mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G

NEG = -1e9


def sample_from_mask(key: jax.Array, mask: jax.Array) -> jax.Array:
    """Uniform (x, y) over True cells of a (W, H) mask. Returns (2,) int32.

    Masked Gumbel-categorical draw. (An inverse-CDF variant — uniform rank
    + prefix-sum locate — was measured on the chip in round 4 and is ~9%
    SLOWER through the per-step regen auto-reset path: the cumsum chain
    serializes where the Gumbel draw's transcendentals pipeline. Kept the
    categorical.)

    Assumes at least one valid cell (generators guarantee this by
    construction, as the reference's loops assume termination).
    """
    W, H = mask.shape
    logits = jnp.where(mask.reshape(-1), 0.0, NEG)
    idx = jax.random.categorical(key, logits)
    return jnp.stack([idx // H, idx % H]).astype(jnp.int32)


def rect_mask(width: int, height: int, top, size) -> jax.Array:
    """(W, H) mask of the placement rectangle (minigrid_env.py:329-335,347-350).

    Matches the reference exactly: top clamps at 0, the rectangle is clipped
    to the grid bounds.
    """
    xs, ys = G.coord_grids(width, height)
    tx = jnp.maximum(jnp.asarray(top[0]), 0)
    ty = jnp.maximum(jnp.asarray(top[1]), 0)
    return (xs >= tx) & (xs < tx + jnp.asarray(size[0])) & (ys >= ty) & (ys < ty + jnp.asarray(size[1]))


def placeable_mask(grid_arr: jax.Array, agent_pos, top=None, size=None) -> jax.Array:
    """Cells where place_obj may land: empty, not the agent, inside the rect."""
    W, H = grid_arr.shape[:2]
    mask = G.free_mask(grid_arr)
    xs, ys = G.coord_grids(W, H)
    mask &= ~((xs == agent_pos[0]) & (ys == agent_pos[1]))
    if top is not None or size is not None:
        top = (0, 0) if top is None else top
        size = (W, H) if size is None else size
        mask &= rect_mask(W, H, top, size)
    return mask


def place_obj(key, grid_arr, cell, agent_pos, top=None, size=None, reject_mask=None):
    """Place ``cell`` uniformly over acceptable positions.

    Returns (new_grid, pos). ``reject_mask`` True marks *forbidden* cells
    (the reference's reject_fn returning True, minigrid_env.py:361).
    """
    mask = placeable_mask(grid_arr, agent_pos, top, size)
    if reject_mask is not None:
        mask &= ~reject_mask
    pos = sample_from_mask(key, mask)
    return G.set_cell(grid_arr, pos[0], pos[1], cell), pos


def place_agent(key, grid_arr, top=None, size=None, rand_dir=True, reject_mask=None):
    """Agent start placement (minigrid_env.py:383-395). Returns (pos, dir)."""
    kp, kd = jax.random.split(key)
    mask = placeable_mask(grid_arr, jnp.array([-1, -1]), top, size)
    if reject_mask is not None:
        mask &= ~reject_mask
    pos = sample_from_mask(kp, mask)
    if rand_dir:
        agent_dir = jax.random.randint(kd, (), 0, 4)
    else:
        agent_dir = jnp.zeros((), jnp.int32)
    return pos, agent_dir


def neighbor_mask(width: int, height: int, pos) -> jax.Array:
    """(W, H) mask of the 8-neighborhood of ``pos`` incl. pos itself.

    Used for ``reject_next_to`` (core/roomgrid.py:11-20) and distractor
    adjacency checks.
    """
    xs, ys = G.coord_grids(width, height)
    return (jnp.abs(xs - pos[0]) <= 1) & (jnp.abs(ys - pos[1]) <= 1)

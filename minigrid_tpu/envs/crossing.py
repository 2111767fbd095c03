"""Crossing environments (reference minigrid/envs/crossing.py:131-208).

Lava/wall "rivers" split the grid; a random monotone staircase path of
openings guarantees solvability. The reference builds rivers with Python
list shuffles (crossing.py:150-158) and walks the path with itertools; here
the same distribution comes from one candidate permutation + a shuffled
move-multiset walked with a static-length loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as G
from minigrid_tpu.core.types import EnvParams
from minigrid_tpu.envs import common as X
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc


class CrossingEnv(MiniGridEnv):
    name = "Crossing"
    __doc__ = env_doc(
        """
        The agent crosses a square room from the top-left corner to the
        green goal square at the opposite corner. Depending on
        ``obstacle_type``, the room is cut by one or more streams of
        obstacles, each spanning the room horizontally or vertically with
        exactly one safe opening; a valid route to the goal always exists.
        With ``"lava"`` the streams are deadly (stepping in ends the
        episode with no reward) — a standard safe-exploration benchmark.
        With ``"wall"`` the streams are plain walls, giving an easy maze
        for quick algorithm sanity checks. Reference:
        minigrid/envs/crossing.py.
        """,
        """
        - ``"lava"``: "avoid the lava and get to the green goal square"
        - ``"wall"``: "find the opening and get to the green goal square"
        """,
        used=(0, 1, 2),
        termination=("The agent reaches the goal.",
                     "The agent falls into lava.",
                     "Timeout (see `max_steps`)."),
        configurations="""
        In the registered ids, S is the grid side length and N the number
        of obstacle streams to cross between start and goal.
        """,
    )

    def __init__(self, size=9, num_crossings=1, obstacle_type="lava",
                 max_steps=None, **kw):
        assert size % 2 == 1
        if max_steps is None:
            max_steps = 4 * size**2
        super().__init__(EnvParams(width=size, height=size, max_steps=max_steps,
                                   see_through_walls=False, **kw))
        self.num_crossings = num_crossings
        self.obstacle_type = obstacle_type

    def default_mission(self) -> str:
        if self.obstacle_type == "lava":
            return "avoid the lava and get to the green goal square"
        return "find the opening and get to the green goal square"

    def _gen_grid(self, key):
        p = self.params
        size = p.width
        k = self.num_crossings
        obstacle = X.LAVA_CELL if self.obstacle_type == "lava" else X.WALL_CELL

        k_rivers, k_path, *k_gaps = jax.random.split(key, 2 + k)
        k_rng = jax.random.fold_in(key, 777)

        grid = G.wall_rect(G.empty_grid(size, size), 0, 0, size, size)
        grid = G.set_cell(grid, size - 2, size - 2, X.GOAL_CELL)

        # candidate rivers: vertical at x, horizontal at y, both from
        # range(2, size-2, 2) (crossing.py:150-152)
        cand = jnp.arange(2, size - 2, 2)
        n = cand.shape[0]
        is_v = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(n, bool)])
        pos = jnp.concatenate([cand, cand])
        perm = jax.random.permutation(k_rivers, 2 * n)
        sel_v, sel_pos = is_v[perm][:k], pos[perm][:k]

        BIG = size  # sentinel beyond any real coordinate
        rivers_v = jnp.sort(jnp.where(sel_v, sel_pos, BIG))       # x positions
        rivers_h = jnp.sort(jnp.where(~sel_v, sel_pos, BIG))      # y positions
        nv = sel_v.sum()
        nh = k - nv

        # paint rivers (interior span 1..size-2)
        xs, ys = G.coord_grids(size, size)
        v_hit = (xs[..., None] == rivers_v) & (rivers_v < BIG)
        h_hit = (ys[..., None] == rivers_h) & (rivers_h < BIG)
        river_mask = (v_hit.any(-1) | h_hit.any(-1)) & (xs >= 1) & (xs < size - 1) \
            & (ys >= 1) & (ys < size - 1)
        grid = jnp.where(river_mask[..., None], obstacle, grid)

        # staircase of openings: nv 'h' moves and nh 'v' moves, shuffled
        flags_h = jnp.arange(k) < nv
        flags_h = jax.random.permutation(k_path, flags_h)

        # pad limits with the outer walls (crossing.py:169-170)
        limits_v = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    rivers_v.astype(jnp.int32)])
        limits_h_hi = jnp.where(rivers_h < BIG, rivers_h, size - 1).astype(jnp.int32)
        limits_h = jnp.concatenate([jnp.zeros(1, jnp.int32), limits_h_hi])

        room_i = jnp.zeros((), jnp.int32)
        room_j = jnp.zeros((), jnp.int32)
        for step in range(k):
            is_h = flags_h[step]
            # h move: opening in vertical river #room_i at random y within
            # the current horizontal band (crossing.py:175-180)
            gx_h = limits_v[room_i + 1]
            gy_h = jax.random.randint(
                k_gaps[step], (), limits_h[room_j] + 1,
                jnp.where(room_j + 1 <= nh, limits_h[room_j + 1], size - 1),
            )
            # v move: opening in horizontal river #room_j at random x
            gx_v = jax.random.randint(
                k_gaps[step], (), limits_v[room_i] + 1,
                jnp.where(room_i + 1 <= nv, limits_v[room_i + 1], size - 1),
            )
            gy_v = limits_h[room_j + 1]
            gx = jnp.where(is_h, gx_h, gx_v)
            gy = jnp.where(is_h, gy_h, gy_v)
            grid = G.set_cell(grid, gx, gy, X.EMPTY_CELL)
            room_i = room_i + is_h.astype(jnp.int32)
            room_j = room_j + (~is_h).astype(jnp.int32)

        return self.make_state(grid, (1, 1), 0, rng=k_rng)

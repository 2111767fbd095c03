"""Playground environment (reference minigrid/envs/playground.py:10-90)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.types import EnvParams, pack_cell
from minigrid_tpu.envs import common as X
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc
from minigrid_tpu.envs.gotoobject import TYPE_IDS


class PlaygroundEnv(MiniGridEnv):
    name = "Playground"
    __doc__ = env_doc(
        """
        A 3x3 arrangement of rooms joined by doors, scattered with a dozen
        random objects. There is no goal, reward or termination condition
        other than the step limit — it exists for interactive exploration
        and debugging of the full object/door interaction surface.
        Reference: minigrid/envs/playground.py.
        """,
        '"" (empty mission)',
        used=(0, 1, 2, 3, 4, 5),
        rewards="None — this environment defines no reward.",
        termination=("Timeout (see `max_steps`).",),
    )

    def __init__(self, max_steps=100, **kw):
        super().__init__(EnvParams(width=19, height=19, max_steps=max_steps, **kw))

    def default_mission(self) -> str:
        return ""

    def _gen_grid(self, key):
        p = self.params
        w, h = p.width, p.height
        room_w, room_h = w // 3, h // 3
        keys = jax.random.split(key, 40)
        ki = 0

        grid = G.wall_rect(G.empty_grid(w, h), 0, 0, w, h)

        for j in range(3):
            for i in range(3):
                xl, yt = i * room_w, j * room_h
                xr, yb = xl + room_w, yt + room_h
                if i + 1 < 3:
                    grid = G.vert_wall(grid, xr, yt, room_h)
                    pos_y = jax.random.randint(keys[ki], (), yt + 1, yb - 1)
                    color = jax.random.randint(
                        jax.random.fold_in(keys[ki], 1), (), 0, 6)
                    grid = G.set_cell(grid, xr, pos_y,
                                      pack_cell(C.DOOR, X.SORTED_COLOR_IDS[color]))
                    ki += 1
                if j + 1 < 3:
                    grid = G.horz_wall(grid, xl, yb, room_w)
                    pos_x = jax.random.randint(keys[ki], (), xl + 1, xr - 1)
                    color = jax.random.randint(
                        jax.random.fold_in(keys[ki], 1), (), 0, 6)
                    grid = G.set_cell(grid, pos_x, yb,
                                      pack_cell(C.DOOR, X.SORTED_COLOR_IDS[color]))
                    ki += 1

        agent_pos, agent_dir = place.place_agent(keys[ki], grid)
        ki += 1

        for _ in range(12):
            t = jax.random.randint(keys[ki], (), 0, 3)
            color = X.SORTED_COLOR_IDS[
                jax.random.randint(jax.random.fold_in(keys[ki], 1), (), 0, 6)
            ]
            cell = pack_cell(TYPE_IDS[t], color)
            grid, _ = place.place_obj(
                jax.random.fold_in(keys[ki], 2), grid, cell, agent_pos)
            ki += 1

        return self.make_state(grid, agent_pos, agent_dir, rng=keys[ki])

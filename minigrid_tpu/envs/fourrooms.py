"""FourRooms environment (reference minigrid/envs/fourrooms.py:78-126)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.types import EnvParams
from minigrid_tpu.envs import common as X
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc


class FourRoomsEnv(MiniGridEnv):
    name = "FourRooms"
    __doc__ = env_doc(
        """
        The classic four-rooms layout from the options/HRL literature: a
        19x19 grid divided into four rooms connected through four gaps in
        the dividing walls. Agent and green goal square are each placed
        uniformly at random (any room), and the agent must navigate to the
        goal. Reference: minigrid/envs/fourrooms.py.
        """,
        '"reach the goal"',
        used=(0, 1, 2),
        termination=("The agent reaches the goal.",
                     "Timeout (see `max_steps`)."),
    )

    def __init__(self, agent_pos=None, goal_pos=None, max_steps=100, **kw):
        super().__init__(EnvParams(width=19, height=19, max_steps=max_steps, **kw))
        self._agent_default_pos = agent_pos
        self._goal_default_pos = goal_pos

    def default_mission(self) -> str:
        return "reach the goal"

    def _gen_grid(self, key):
        p = self.params
        w, h = p.width, p.height
        room_w, room_h = w // 2, h // 2
        keys = jax.random.split(key, 8)

        grid = G.wall_rect(G.empty_grid(w, h), 0, 0, w, h)

        # Interior walls with one random gap each. Gap draw order matches
        # the reference loops (per room cell: vertical then horizontal).
        ki = iter(keys[:4])
        for j in range(2):
            for i in range(2):
                xl, yt = i * room_w, j * room_h
                xr, yb = xl + room_w, yt + room_h
                if i + 1 < 2:
                    grid = G.vert_wall(grid, xr, yt, room_h)
                    gap_y = jax.random.randint(next(ki), (), yt + 1, yb)
                    grid = G.set_cell(grid, xr, gap_y, X.EMPTY_CELL)
                if j + 1 < 2:
                    grid = G.horz_wall(grid, xl, yb, room_w)
                    gap_x = jax.random.randint(next(ki), (), xl + 1, xr)
                    grid = G.set_cell(grid, gap_x, yb, X.EMPTY_CELL)

        if self._agent_default_pos is not None:
            agent_pos = jnp.asarray(self._agent_default_pos, jnp.int32)
            grid = G.set_cell(grid, agent_pos[0], agent_pos[1], X.EMPTY_CELL)
            agent_dir = jax.random.randint(keys[4], (), 0, 4)
        else:
            agent_pos, agent_dir = place.place_agent(keys[5], grid)

        if self._goal_default_pos is not None:
            gp = self._goal_default_pos
            grid = G.set_cell(grid, gp[0], gp[1], X.GOAL_CELL)
        else:
            grid, _ = place.place_obj(keys[6], grid, X.GOAL_CELL, agent_pos)
        return self.make_state(grid, agent_pos, agent_dir, rng=keys[7])

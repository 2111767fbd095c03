"""Fetch environment (reference minigrid/envs/fetch.py:95-175)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.mission import mission_table
from minigrid_tpu.core.step import reward_on_success
from minigrid_tpu.core.types import EnvParams, pack_cell
from minigrid_tpu.core.mission_space import MissionSpace, TemplateMission
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc

OBJ_TYPES = [C.KEY, C.BALL]
TYPE_NAMES = ["key", "ball"]
SYNTAXES = ["get a", "go get a", "fetch a", "go fetch a", "you must fetch a"]

# (5 syntaxes x 6 colors x 2 types) tokenized missions; index =
# (syntax * 6 + color) * 2 + type  (fetch.py:148-158)
MISSIONS = mission_table([
    f"{syn} {C.IDX_TO_COLOR[color]} {tname}"
    for syn in SYNTAXES for color in range(6) for tname in TYPE_NAMES
])


class FetchEnv(MiniGridEnv):
    name = "Fetch"
    __doc__ = env_doc(
        """
        A room scattered with keys and balls of assorted colors. The
        mission string names exactly one (color, type) pair, and the agent
        must pick up a matching object. Grabbing anything else ends the
        episode with zero reward, so the task requires grounding the
        instruction text in the observation. Reference:
        minigrid/envs/fetch.py.
        """,
        '"{syntax} {color} {type}"',
        mission_notes="""
        {syntax}: one of "get a", "go get a", "fetch a", "go fetch a",
        "you must fetch a".

        {color}: "red", "green", "blue", "purple", "yellow" or "grey".

        {type}: "key" or "ball".
        """,
        used=(0, 1, 2, 3),
        termination=("The agent picks up the requested object.",
                     "The agent picks up a different object.",
                     "Timeout (see `max_steps`)."),
        configurations="N in the registered ids is the object count.",
    )

    def mission_space(self):
        """Reference fetch.py:77-88."""
        return MissionSpace(
            mission_func=TemplateMission("{} {} {}", 3),
            ordered_placeholders=[SYNTAXES, C.COLOR_NAMES, TYPE_NAMES],
        )

    def __init__(self, size=8, numObjs=3, max_steps=None, **kw):
        if max_steps is None:
            max_steps = 5 * size**2
        super().__init__(EnvParams(width=size, height=size, max_steps=max_steps,
                                   see_through_walls=True, **kw))
        self.num_objs = numObjs

    def _gen_grid(self, key):
        p = self.params
        keys = jax.random.split(key, 2 * self.num_objs + 4)
        grid = G.empty_grid(p.width, p.height)
        grid = G.horz_wall(grid, 0, 0)
        grid = G.horz_wall(grid, 0, p.height - 1)
        grid = G.vert_wall(grid, 0, 0)
        grid = G.vert_wall(grid, p.width - 1, 0)

        no_agent = jnp.array([-1, -1])
        types = []
        colors = []
        for i in range(self.num_objs):
            t = jax.random.randint(keys[2 * i], (), 0, 2)
            color = jax.random.randint(jax.random.fold_in(keys[2 * i], 1), (), 0, 6)
            cell = pack_cell(
                jnp.where(t == 0, C.KEY, C.BALL).astype(jnp.uint8), color
            )
            grid, _ = place.place_obj(keys[2 * i + 1], grid, cell, no_agent)
            types.append(t)
            colors.append(color)

        agent_pos, agent_dir = place.place_agent(keys[-3], grid)

        target_idx = jax.random.randint(keys[-2], (), 0, self.num_objs)
        tt = jnp.stack(types)[target_idx]
        tc = jnp.stack(colors)[target_idx]
        syntax = jax.random.randint(keys[-1], (), 0, 5)
        mission = jnp.asarray(MISSIONS)[(syntax * 6 + tc) * 2 + tt]

        extra = {
            "target_type": jnp.where(tt == 0, C.KEY, C.BALL).astype(jnp.uint8),
            "target_color": tc.astype(jnp.uint8),
        }
        return self.make_state(grid, agent_pos, agent_dir,
                               rng=jax.random.fold_in(key, 99),
                               mission=mission, extra=extra)

    def _post_step(self, prev, state, action, reward, terminated):
        carrying = state.carrying[0] != C.EMPTY
        match = (
            (state.carrying[0] == state.extra["target_type"])
            & (state.carrying[1] == state.extra["target_color"])
        )
        reward = jnp.where(
            carrying & match, reward_on_success(self.params, state.step_count),
            jnp.where(carrying, 0.0, reward),
        )
        terminated = terminated | carrying
        return state, reward, terminated

"""PutNear environment (reference minigrid/envs/putnear.py:85-199)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.mission import mission_table
from minigrid_tpu.core.step import reward_on_success
from minigrid_tpu.core.types import EnvParams, pack_cell
from minigrid_tpu.core.mission_space import MissionSpace, TemplateMission
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc
from minigrid_tpu.envs.gotoobject import TYPE_IDS, TYPE_NAMES, sample_distinct_type_colors

# index = (move_type*6+move_color)*18 + target_type*6+target_color
MISSIONS = mission_table([
    f"put the {C.IDX_TO_COLOR[mc]} {mt} near the {C.IDX_TO_COLOR[tc]} {tt}"
    for mt in TYPE_NAMES for mc in range(6)
    for tt in TYPE_NAMES for tc in range(6)
])


class PutNearEnv(MiniGridEnv):
    name = "PutNear"
    __doc__ = env_doc(
        """
        Several objects share one room; the instruction names a mover
        object and a fixed target object. The agent must pick up the
        mover and drop it on a cell adjacent to the target. Easy with two
        objects, but combining language grounding with multi-object
        spatial reasoning makes larger counts genuinely hard. Picking up
        the wrong object fails immediately. Reference:
        minigrid/envs/putnear.py.
        """,
        '"put the {move_color} {move_type} near the {target_color} '
        '{target_type}"',
        mission_notes="""
        The color slots draw from "red", "green", "blue", "purple",
        "yellow" or "grey"; the type slots from "box", "ball" or "key".
        """,
        used=(0, 1, 2, 3, 4),
        termination=("The agent picks up the wrong object.",
                     "The agent drops the mover next to the target.",
                     "Timeout (see `max_steps`)."),
        configurations="N in the registered ids is the object count.",
    )

    def mission_space(self):
        """Reference putnear.py:73-80."""
        return MissionSpace(
            mission_func=TemplateMission("put the {} {} near the {} {}", 4),
            ordered_placeholders=[C.COLOR_NAMES, TYPE_NAMES,
                                  C.COLOR_NAMES, TYPE_NAMES],
        )

    def __init__(self, size=6, numObjs=2, max_steps=None, **kw):
        if max_steps is None:
            max_steps = 5 * size
        super().__init__(EnvParams(width=size, height=size, max_steps=max_steps,
                                   see_through_walls=True, **kw))
        self.num_objs = numObjs

    def _gen_grid(self, key):
        p = self.params
        keys = jax.random.split(key, self.num_objs + 5)
        grid = G.empty_grid(p.width, p.height)
        grid = G.horz_wall(grid, 0, 0)
        grid = G.horz_wall(grid, 0, p.height - 1)
        grid = G.vert_wall(grid, 0, 0)
        grid = G.vert_wall(grid, p.width - 1, 0)

        t_idx, colors = sample_distinct_type_colors(keys[0], self.num_objs)
        no_agent = jnp.array([-1, -1])
        positions = []
        # no object may land in another's 8-neighborhood (putnear.py:119-126)
        reject = jnp.zeros((p.width, p.height), bool)
        for i in range(self.num_objs):
            cell = pack_cell(TYPE_IDS[t_idx[i]], colors[i])
            grid, pos = place.place_obj(
                keys[i + 1], grid, cell, no_agent, reject_mask=reject
            )
            positions.append(pos)
            reject |= place.neighbor_mask(p.width, p.height, pos)

        agent_pos, agent_dir = place.place_agent(keys[-4], grid)

        move_idx = jax.random.randint(keys[-3], (), 0, self.num_objs)
        # target != move (putnear.py:163-166): uniform over the others
        shift = jax.random.randint(keys[-2], (), 1, self.num_objs)
        target_idx = (move_idx + shift) % self.num_objs

        positions = jnp.stack(positions)
        mt, mc = t_idx[move_idx], colors[move_idx]
        tt, tc = t_idx[target_idx], colors[target_idx]
        mission = jnp.asarray(MISSIONS)[(mt * 6 + mc) * 18 + tt * 6 + tc]
        extra = {
            "move_type": TYPE_IDS[mt],
            "move_color": mc.astype(jnp.uint8),
            "target_pos": positions[target_idx],
        }
        return self.make_state(grid, agent_pos, agent_dir, rng=keys[-1],
                               mission=mission, extra=extra)

    def _post_step(self, prev, state, action, reward, terminated):
        carrying = state.carrying[0] != C.EMPTY
        wrong = (
            (state.carrying[0] != state.extra["move_type"])
            | (state.carrying[1] != state.extra["move_color"])
        )
        terminated = terminated | (
            (action == Actions.pickup) & carrying & wrong
        )

        pre_carried = prev.carrying[0] != C.EMPTY
        # drop succeeded iff carrying emptied this step (putnear.py:190-195)
        fwd = state.agent_pos + jnp.asarray(C.DIR_TO_VEC)[state.agent_dir]
        dropped = pre_carried & (state.carrying[0] == C.EMPTY)
        d = jnp.abs(fwd - state.extra["target_pos"])
        near = (d[0] <= 1) & (d[1] <= 1)
        is_drop = action == Actions.drop
        reward = jnp.where(
            is_drop & dropped & near,
            reward_on_success(self.params, state.step_count), reward,
        )
        terminated = terminated | (is_drop & pre_carried)
        return state, reward, terminated

"""GoToDoor environment (reference minigrid/envs/gotodoor.py:75-149)."""

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

MISSIONS = mission_table([
    f"go to the {C.IDX_TO_COLOR[c]} door" for c in range(6)
])


class GoToDoorEnv(MiniGridEnv):
    name = "GoToDoor"
    __doc__ = env_doc(
        """
        A single room with one door of a distinct color centered in each of
        its four walls. The mission string names a door color; the agent
        must walk up next to that door and signal completion with the
        ``done`` action, earning a reward only for the correct door.
        Reference: minigrid/envs/gotodoor.py.
        """,
        '"go to the {color} door"',
        mission_notes="""
        {color}: "red", "green", "blue", "purple", "yellow" or "grey".
        """,
        used=(0, 1, 2, 6),
        termination=("The agent performs ``done`` while standing next to "
                     "the requested door.",
                     "Timeout (see `max_steps`)."),
    )

    def mission_space(self):
        """Reference gotodoor.py:69-72."""
        return MissionSpace(
            mission_func=TemplateMission("go to the {} door", 1),
            ordered_placeholders=[C.COLOR_NAMES],
        )

    def __init__(self, size=5, max_steps=None, **kw):
        assert size >= 5
        if max_steps is None:
            max_steps = 4 * size**2
        super().__init__(EnvParams(width=size, height=size, max_steps=max_steps,
                                   see_through_walls=True, **kw))

    def _gen_grid(self, key):
        p = self.params
        keys = jax.random.split(key, 10)

        # randomly vary the room extent (gotodoor.py:95-97)
        w = jax.random.randint(keys[0], (), 5, p.width + 1)
        h = jax.random.randint(keys[1], (), 5, p.height + 1)

        grid = G.empty_grid(p.width, p.height)
        grid = G.fill_rect(grid, 0, 0, w, 1, jnp.asarray(C.WALL_CELL))
        grid = G.fill_rect(grid, 0, h - 1, w, 1, jnp.asarray(C.WALL_CELL))
        grid = G.fill_rect(grid, 0, 0, 1, h, jnp.asarray(C.WALL_CELL))
        grid = G.fill_rect(grid, w - 1, 0, 1, h, jnp.asarray(C.WALL_CELL))

        zero = jnp.zeros((), jnp.int32)
        door_pos = jnp.stack([
            jnp.stack([jax.random.randint(keys[2], (), 2, w - 2), zero]),
            jnp.stack([jax.random.randint(keys[3], (), 2, w - 2), h - 1]),
            jnp.stack([zero, jax.random.randint(keys[4], (), 2, h - 2)]),
            jnp.stack([w - 1, jax.random.randint(keys[5], (), 2, h - 2)]),
        ])
        door_colors = jax.random.permutation(keys[6], 6)[:4]
        for i in range(4):
            grid = G.set_cell(
                grid, door_pos[i, 0], door_pos[i, 1],
                pack_cell(C.DOOR, door_colors[i]),
            )

        rect = place.rect_mask(p.width, p.height, (0, 0), (w, h))
        mask = G.free_mask(grid) & rect
        agent_pos = place.sample_from_mask(keys[7], mask)
        agent_dir = jax.random.randint(keys[8], (), 0, 4)

        door_idx = jax.random.randint(keys[9], (), 0, 4)
        target_color = door_colors[door_idx]
        extra = {"target_pos": door_pos[door_idx]}
        return self.make_state(
            grid, agent_pos, agent_dir, rng=jax.random.fold_in(key, 99),
            mission=jnp.asarray(MISSIONS)[target_color], extra=extra,
        )

    def _post_step(self, prev, state, action, reward, terminated):
        d = jnp.abs(state.agent_pos - state.extra["target_pos"])
        adjacent = ((d[0] == 0) & (d[1] == 1)) | ((d[1] == 0) & (d[0] == 1))
        is_done = action == Actions.done
        reward = jnp.where(
            is_done & adjacent, reward_on_success(self.params, state.step_count),
            reward,
        )
        terminated = terminated | is_done | (action == Actions.toggle)
        return state, reward, terminated

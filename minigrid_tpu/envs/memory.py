"""Memory environment (reference minigrid/envs/memory.py:60-165).

T-maze: the agent sees an object in the start room, walks down a hallway,
and must turn toward the matching object at the junction. ``success_pos`` /
``failure_pos`` live in ``state.extra``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.step import reward_on_success
from minigrid_tpu.core.types import EnvParams, pack_cell
from minigrid_tpu.envs import common as X
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc

GREEN_KEY = pack_cell(C.KEY, X.GREEN)
GREEN_BALL = pack_cell(C.BALL, X.GREEN)


class MemoryEnv(MiniGridEnv):
    name = "MemoryS"
    __doc__ = env_doc(
        """
        A memory probe: the agent begins in a small chamber containing one
        object (key or ball), then walks a narrow hallway that forks at
        the far end. Each fork tip holds an object, one matching what was
        seen in the chamber. The agent must remember the initial object
        and step onto the matching fork tip; choosing the wrong side ends
        the episode with no reward. ``Random`` ids randomize the hallway
        length. Reference: minigrid/envs/memory.py.
        """,
        '"go to the matching object at the end of the hallway"',
        used=(0, 1, 2, 3, 5),
        termination=("The agent reaches the matching object.",
                     "The agent reaches the wrong object.",
                     "Timeout (see `max_steps`)."),
        configurations="S in the registered ids is the grid side length.",
    )

    def __init__(self, size=8, random_length=False, max_steps=None, **kw):
        if max_steps is None:
            max_steps = 5 * size**2
        super().__init__(EnvParams(width=size, height=size, max_steps=max_steps,
                                   see_through_walls=False, **kw))
        self.random_length = random_length

    def default_mission(self) -> str:
        return "go to the matching object at the end of the hallway"

    def _gen_grid(self, key):
        p = self.params
        w, h = p.width, p.height
        assert h % 2 == 1
        k_rng, k_end, k_agent, k_start, k_other = jax.random.split(key, 5)

        grid = G.empty_grid(w, h)
        grid = G.horz_wall(grid, 0, 0)
        grid = G.horz_wall(grid, 0, h - 1)
        grid = G.vert_wall(grid, 0, 0)
        grid = G.vert_wall(grid, w - 1, 0)

        urw = h // 2 - 2  # upper room wall
        lrw = h // 2 + 2  # lower room wall
        if self.random_length:
            hallway_end = jax.random.randint(k_end, (), 4, w - 2)
        else:
            hallway_end = jnp.asarray(w - 3, jnp.int32)

        # start room (memory.py:110-115)
        grid = G.fill_rect(grid, 1, urw, 4, 1, X.WALL_CELL)
        grid = G.fill_rect(grid, 1, lrw, 4, 1, X.WALL_CELL)
        grid = G.set_cell(grid, 4, urw + 1, X.WALL_CELL)
        grid = G.set_cell(grid, 4, lrw - 1, X.WALL_CELL)

        # horizontal hallway (memory.py:118-120)
        grid = G.fill_rect(grid, 5, urw + 1, hallway_end - 5, 1, X.WALL_CELL)
        grid = G.fill_rect(grid, 5, lrw - 1, hallway_end - 5, 1, X.WALL_CELL)

        # vertical hallway (memory.py:123-126)
        grid = G.fill_rect(grid, hallway_end, 0, 1, h, X.WALL_CELL)
        grid = G.set_cell(grid, hallway_end, h // 2, X.EMPTY_CELL)
        grid = G.fill_rect(grid, hallway_end + 2, 0, 1, h, X.WALL_CELL)

        agent_x = jax.random.randint(k_agent, (), 1, hallway_end + 1)
        agent_pos = jnp.stack([agent_x, jnp.asarray(h // 2, jnp.int32)])

        start_is_key = jax.random.randint(k_start, (), 0, 2) == 0
        start_obj = jnp.where(start_is_key, GREEN_KEY, GREEN_BALL)
        grid = G.set_cell(grid, 1, h // 2 - 1, start_obj)

        # order draw: [Ball, Key] vs [Key, Ball] (memory.py:135)
        top_is_ball = jax.random.randint(k_other, (), 0, 2) == 0
        obj0 = jnp.where(top_is_ball, GREEN_BALL, GREEN_KEY)
        obj1 = jnp.where(top_is_ball, GREEN_KEY, GREEN_BALL)
        pos0 = jnp.stack([hallway_end + 1, jnp.asarray(h // 2 - 2, jnp.int32)])
        pos1 = jnp.stack([hallway_end + 1, jnp.asarray(h // 2 + 2, jnp.int32)])
        grid = G.set_cell(grid, pos0[0], pos0[1], obj0)
        grid = G.set_cell(grid, pos1[0], pos1[1], obj1)

        start_matches_top = start_is_key != top_is_ball  # start == obj0 type
        success_pos = jnp.where(
            start_matches_top, pos0 + jnp.array([0, 1]), pos1 + jnp.array([0, -1])
        )
        failure_pos = jnp.where(
            start_matches_top, pos1 + jnp.array([0, -1]), pos0 + jnp.array([0, 1])
        )
        extra = {"success_pos": success_pos, "failure_pos": failure_pos}
        return self.make_state(grid, agent_pos, 0, rng=k_rng, extra=extra)

    def _transform_action(self, state, action):
        return jnp.where(action == Actions.pickup, Actions.toggle.value, action)

    def _post_step(self, prev, state, action, reward, terminated):
        at_success = (state.agent_pos == state.extra["success_pos"]).all()
        at_failure = (state.agent_pos == state.extra["failure_pos"]).all()
        reward = jnp.where(
            at_success, reward_on_success(self.params, state.step_count), reward
        )
        reward = jnp.where(at_failure, 0.0, reward)
        terminated = terminated | at_success | at_failure
        return state, reward, terminated

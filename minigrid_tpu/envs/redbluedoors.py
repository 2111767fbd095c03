"""RedBlueDoors environment (reference minigrid/envs/redbluedoors.py:60-126)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.step import reward_on_success
from minigrid_tpu.core.types import EnvParams, pack_cell
from minigrid_tpu.envs import common as X
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc


class RedBlueDoorEnv(MiniGridEnv):
    name = "RedBlueDoors"
    __doc__ = env_doc(
        """
        The agent starts at a random pose in a room that has a red door on
        one side and a blue door on the opposite side. It must open the
        red door first and the blue door second; opening the blue door
        early is an immediate failure. (Counter-intuitively the task is
        solvable without memory: the red door's open state stays visible.)
        Reference: minigrid/envs/redbluedoors.py.
        """,
        '"open the red door then the blue door"',
        used=(0, 1, 2, 5),
        termination=("The agent opens the blue door after the red one — "
                     "success.",
                     "The agent opens the blue door before the red one — "
                     "failure.",
                     "Timeout (see `max_steps`)."),
    )

    def __init__(self, size=8, max_steps=None, **kw):
        if max_steps is None:
            max_steps = 20 * size**2
        super().__init__(EnvParams(width=2 * size, height=size,
                                   max_steps=max_steps, **kw))
        self.size = size

    def default_mission(self) -> str:
        return "open the red door then the blue door"

    def _gen_grid(self, key):
        s = self.size
        keys = jax.random.split(key, 4)
        grid = G.empty_grid(2 * s, s)
        grid = G.wall_rect(grid, 0, 0, 2 * s, s)
        grid = G.wall_rect(grid, s // 2, 0, s, s)

        rect = place.rect_mask(2 * s, s, (s // 2, 0), (s, s))
        mask = G.free_mask(grid) & rect
        agent_pos = place.sample_from_mask(keys[0], mask)
        agent_dir = jax.random.randint(keys[1], (), 0, 4)

        red_y = jax.random.randint(keys[2], (), 1, s - 1)
        blue_y = jax.random.randint(keys[3], (), 1, s - 1)
        red_pos = jnp.stack([jnp.asarray(s // 2, jnp.int32), red_y])
        blue_pos = jnp.stack([jnp.asarray(s // 2 + s - 1, jnp.int32), blue_y])
        grid = G.set_cell(grid, red_pos[0], red_pos[1], pack_cell(C.DOOR, X.RED, C.CLOSED))
        grid = G.set_cell(grid, blue_pos[0], blue_pos[1], pack_cell(C.DOOR, X.BLUE, C.CLOSED))

        extra = {"red_pos": red_pos, "blue_pos": blue_pos}
        return self.make_state(grid, agent_pos, agent_dir,
                               rng=jax.random.fold_in(key, 99), extra=extra)

    def _post_step(self, prev, state, action, reward, terminated):
        rp, bp = state.extra["red_pos"], state.extra["blue_pos"]
        red_before = prev.grid[rp[0], rp[1], 2] == C.OPEN
        blue_before = prev.grid[bp[0], bp[1], 2] == C.OPEN
        red_after = state.grid[rp[0], rp[1], 2] == C.OPEN
        blue_after = state.grid[bp[0], bp[1], 2] == C.OPEN

        success = blue_after & red_before
        fail = (blue_after & ~red_before) | (~blue_after & red_after & blue_before)
        reward = jnp.where(
            success, reward_on_success(self.params, state.step_count),
            jnp.where(fail, 0.0, reward),
        )
        terminated = terminated | success | fail
        return state, reward, terminated

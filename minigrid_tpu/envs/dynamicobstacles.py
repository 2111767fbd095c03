"""DynamicObstacles environment (reference minigrid/envs/dynamicobstacles.py).

Moving blue balls re-place themselves in their 3x3 neighborhood before the
agent transition (reference step :136-159); walking into any non-goal
obstacle terminates with reward -1 (:160-165). Obstacle slots live in
``state.extra['obstacles']`` so the per-step movement is a fixed-length
sequential sweep (each ball's move updates the free mask seen by the next —
the same order-dependence as the reference's Python loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.types import EnvParams
from minigrid_tpu.envs import common as X
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc

BALL_CELL = jnp.asarray([C.BALL, X.BLUE, 0, 0, 0], jnp.uint8)


class DynamicObstaclesEnv(MiniGridEnv):
    name = "Dynamic-Obstacles"
    __doc__ = env_doc(
        """
        An empty room populated with blue balls that jump to a random free
        cell in their 3x3 neighborhood every step. The agent must reach
        the green goal square without ever walking into an obstacle;
        colliding costs a -1 penalty and ends the episode. Useful for
        studying dynamic obstacle avoidance under partial observability.
        The ``Random`` ids start the agent at a random pose instead of the
        fixed top-left corner. Reference:
        minigrid/envs/dynamicobstacles.py.
        """,
        '"get to the green goal square"',
        used=(0, 1, 2),
        num_actions=3,
        rewards="""
        A reward of `1 - 0.9 * (step_count / max_steps)` is given on
        success, and `0` on failure; colliding with an obstacle yields -1.
        """,
        termination=("The agent reaches the goal.",
                     "The agent collides with an obstacle.",
                     "Timeout (see `max_steps`)."),
    )

    def __init__(self, size=8, agent_start_pos=(1, 1), agent_start_dir=0,
                 n_obstacles=4, max_steps=None, **kw):
        if max_steps is None:
            max_steps = 4 * size**2
        super().__init__(EnvParams(width=size, height=size, max_steps=max_steps,
                                   see_through_walls=True, **kw))
        self.agent_start_pos = agent_start_pos
        self.agent_start_dir = agent_start_dir
        # reference caps obstacle count at size/2 (:85-88)
        self.n_obstacles = int(n_obstacles) if n_obstacles <= size / 2 + 1 else int(size / 2)

    @property
    def num_actions(self) -> int:
        return 3  # left/right/forward only (reference :104)

    reward_range = (-1, 1)  # collision penalty (reference :105)

    def _gen_grid(self, key):
        p = self.params
        keys = jax.random.split(key, self.n_obstacles + 2)
        grid = G.wall_rect(G.empty_grid(p.width, p.height), 0, 0, p.width, p.height)
        grid = G.set_cell(grid, p.width - 2, p.height - 2, X.GOAL_CELL)

        if self.agent_start_pos is not None:
            agent_pos = jnp.asarray(self.agent_start_pos, jnp.int32)
            agent_dir = jnp.asarray(self.agent_start_dir, jnp.int32)
        else:
            agent_pos, agent_dir = place.place_agent(keys[-2], grid)

        positions = []
        for i in range(self.n_obstacles):
            grid, pos = place.place_obj(keys[i], grid, BALL_CELL, agent_pos)
            positions.append(pos)
        extra = {"obstacles": jnp.stack(positions)}
        return self.make_state(grid, agent_pos, agent_dir, rng=keys[-1], extra=extra)

    def _transform_action(self, state, action):
        # invalid actions collapse to 'left' (reference :138-140)
        return jnp.where(jnp.asarray(action, jnp.int32) >= 3, 0, action)

    def _pre_step(self, key, state, action):
        grid = state.grid
        obstacles = state.extra["obstacles"]
        keys = jax.random.split(key, self.n_obstacles)
        for i in range(self.n_obstacles):
            old = obstacles[i]
            mask = place.placeable_mask(
                grid, state.agent_pos, top=(old[0] - 1, old[1] - 1), size=(3, 3)
            )
            ok = mask.any()
            new = jnp.where(
                ok, place.sample_from_mask(keys[i], mask), old
            )
            # coordinate blends, not scatters (grid.py onehot_set):
            # narrow-dtype traced-index scatters corrupt at large vmap
            # batch on TPU; x=-1 writes nothing
            grid = G.set_cell(grid, jnp.where(ok, old[0], -1), old[1],
                              jnp.asarray(C.EMPTY_CELL))
            grid = G.set_cell(grid, jnp.where(ok, new[0], -1), new[1],
                              BALL_CELL)
            obstacles = obstacles.at[i].set(new)  # int32 + static i: safe
        return state.replace(grid=grid, extra={"obstacles": obstacles})

    def _post_step(self, prev, state, action, reward, terminated):
        # collision test uses the PRE-MOVE front cell (reference :142-144)
        fwd = prev.agent_pos + jnp.asarray(C.DIR_TO_VEC)[prev.agent_dir]
        fx = jnp.clip(fwd[0], 0, self.params.width - 1)
        fy = jnp.clip(fwd[1], 0, self.params.height - 1)
        ftype = prev.grid[fx, fy, 0]
        not_clear = (ftype != C.EMPTY) & (ftype != C.GOAL)
        hit = (action == Actions.forward) & not_clear
        reward = jnp.where(hit, -1.0, reward)
        terminated = terminated | hit
        return state, reward, terminated

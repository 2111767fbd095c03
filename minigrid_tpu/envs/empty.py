"""Empty room environment (reference minigrid/envs/empty.py:9-114)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.types import EnvParams, pack_cell
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc

GOAL_CELL = pack_cell(C.GOAL, C.COLOR_TO_IDX["green"])


@dataclasses.dataclass(frozen=True)
class EmptyParams(EnvParams):
    agent_start_pos: tuple[int, int] | None = (1, 1)
    agent_start_dir: int = 0


class EmptyEnv(MiniGridEnv):
    name = "Empty"
    __doc__ = env_doc(
        """
        A bare walled room whose only feature is the green goal square in
        the bottom-right corner. Reaching it yields a sparse reward
        discounted by episode length. Small sizes are the canonical "does
        my algorithm run at all" check; large sizes probe exploration under
        sparse reward. In the ``Random`` variants the agent's start pose is
        re-sampled every episode; otherwise it always starts in the corner
        opposite the goal. Reference: minigrid/envs/empty.py.
        """,
        '"get to the green goal square"',
        used=(0, 1, 2),
        termination=("The agent reaches the goal.",
                     "Timeout (see `max_steps`)."),
    )

    def __init__(self, size=8, agent_start_pos=(1, 1), agent_start_dir=0,
                 max_steps=None, **kw):
        if max_steps is None:
            max_steps = 4 * size**2
        super().__init__(
            EmptyParams(
                width=size,
                height=size,
                max_steps=max_steps,
                see_through_walls=True,  # reference empty.py:87
                agent_start_pos=agent_start_pos,
                agent_start_dir=agent_start_dir,
                **kw,
            )
        )

    def _gen_grid(self, key):
        p = self.params
        grid = G.wall_rect(G.empty_grid(p.width, p.height), 0, 0, p.width, p.height)
        grid = G.set_cell(grid, p.width - 2, p.height - 2, GOAL_CELL)

        k_rng, k_place = jax.random.split(key)
        if p.agent_start_pos is not None:
            pos = jnp.asarray(p.agent_start_pos, jnp.int32)
            agent_dir = jnp.asarray(p.agent_start_dir, jnp.int32)
        else:
            pos, agent_dir = place.place_agent(k_place, grid)
        return self.make_state(grid, pos, agent_dir, rng=k_rng)

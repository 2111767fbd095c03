"""DoorKey environment (reference minigrid/envs/doorkey.py:9-99)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.types import EnvParams, pack_cell
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc

GOAL_CELL = pack_cell(C.GOAL, C.COLOR_TO_IDX["green"])
YELLOW = C.COLOR_TO_IDX["yellow"]
LOCKED_YELLOW_DOOR = pack_cell(C.DOOR, YELLOW, C.LOCKED)
YELLOW_KEY = pack_cell(C.KEY, YELLOW)


class DoorKeyEnv(MiniGridEnv):
    name = "DoorKey"
    __doc__ = env_doc(
        """
        A wall with a single locked yellow door splits the room in two; the
        agent and a yellow key start on one side and the green goal square
        sits on the other. The agent must collect the key, unlock the door
        and walk to the goal. The reward is sparse, which makes the larger
        sizes hard for vanilla RL — a common testbed for curiosity and
        curriculum methods. Reference: minigrid/envs/doorkey.py.
        """,
        '"use the key to open the door and then get to the goal"',
        used=(0, 1, 2, 3, 5),
        termination=("The agent reaches the goal.",
                     "Timeout (see `max_steps`)."),
    )

    def __init__(self, size=8, max_steps=None, **kw):
        if max_steps is None:
            max_steps = 10 * size**2
        super().__init__(EnvParams(width=size, height=size, max_steps=max_steps, **kw))

    def default_mission(self) -> str:
        return "use the key to open the door and then get to the goal"

    def _gen_grid(self, key):
        p = self.params
        k_rng, k_split, k_agent, k_door, k_key = jax.random.split(key, 5)

        grid = G.wall_rect(G.empty_grid(p.width, p.height), 0, 0, p.width, p.height)
        grid = G.set_cell(grid, p.width - 2, p.height - 2, GOAL_CELL)

        split = jax.random.randint(k_split, (), 2, p.width - 2)
        grid = G.vert_wall(grid, split, 0)

        agent_pos, agent_dir = place.place_agent(
            k_agent, grid, top=(0, 0), size=(split, p.height)
        )

        door_y = jax.random.randint(k_door, (), 1, p.height - 2)
        grid = G.set_cell(grid, split, door_y, LOCKED_YELLOW_DOOR)

        grid, _ = place.place_obj(
            k_key, grid, YELLOW_KEY, agent_pos, top=(0, 0), size=(split, p.height)
        )
        return self.make_state(grid, agent_pos, agent_dir, rng=k_rng)

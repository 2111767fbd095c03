"""GoToObject environment (reference minigrid/envs/gotoobject.py:70-160)."""

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

TYPE_IDS = jnp.asarray([C.KEY, C.BALL, C.BOX], jnp.uint8)
TYPE_NAMES = ["key", "ball", "box"]

# index = type * 6 + color
MISSIONS = mission_table([
    f"go to the {C.IDX_TO_COLOR[c]} {t}" for t in TYPE_NAMES for c in range(6)
])


def sample_distinct_type_colors(key, n, num_types=3):
    """n distinct (type, color) pairs, uniform without replacement.

    The reference redraws until unseen (gotoobject.py:106-112); sequential
    uniform-distinct draws are exactly a random permutation prefix.
    """
    combo = jax.random.permutation(key, num_types * 6)[:n]
    return combo // 6, combo % 6  # type index, color index


class GoToObjectEnv(MiniGridEnv):
    name = "GoToObject"
    __doc__ = env_doc(
        """
        A room containing several colored objects (keys, balls, boxes).
        The mission string picks out one of them by color and type (e.g.
        "go to the red key"); the agent earns its reward by performing the
        ``done`` action while adjacent to the named object. Reference:
        minigrid/envs/gotoobject.py.
        """,
        '"go to the {color} {obj_type}"',
        mission_notes="""
        {color}: "red", "green", "blue", "purple", "yellow" or "grey".

        {obj_type}: "key", "ball" or "box".
        """,
        used=(0, 1, 2, 6),
        termination=("The agent performs ``done`` next to the requested "
                     "object.",
                     "Timeout (see `max_steps`)."),
        configurations="N in the registered ids is the object count.",
    )

    def mission_space(self):
        """Reference gotoobject.py:72-75."""
        return MissionSpace(
            mission_func=TemplateMission("go to the {} {}", 2),
            ordered_placeholders=[C.COLOR_NAMES, TYPE_NAMES],
        )

    def __init__(self, size=6, numObjs=2, max_steps=None, **kw):
        if max_steps is None:
            max_steps = 5 * size**2
        super().__init__(EnvParams(width=size, height=size, max_steps=max_steps,
                                   see_through_walls=True, **kw))
        self.num_objs = numObjs

    def _gen_grid(self, key):
        p = self.params
        keys = jax.random.split(key, self.num_objs + 4)
        grid = G.wall_rect(G.empty_grid(p.width, p.height), 0, 0, p.width, p.height)

        t_idx, colors = sample_distinct_type_colors(keys[0], self.num_objs)
        no_agent = jnp.array([-1, -1])
        positions = []
        for i in range(self.num_objs):
            cell = pack_cell(TYPE_IDS[t_idx[i]], colors[i])
            grid, pos = place.place_obj(keys[i + 1], grid, cell, no_agent)
            positions.append(pos)

        agent_pos, agent_dir = place.place_agent(keys[-3], grid)

        obj_idx = jax.random.randint(keys[-2], (), 0, self.num_objs)
        extra = {"target_pos": jnp.stack(positions)[obj_idx]}
        mission = jnp.asarray(MISSIONS)[t_idx[obj_idx] * 6 + colors[obj_idx]]
        return self.make_state(grid, agent_pos, agent_dir, rng=keys[-1],
                               mission=mission, extra=extra)

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

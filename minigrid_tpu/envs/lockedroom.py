"""LockedRoom environment (reference minigrid/envs/lockedroom.py:24-173)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.mission import mission_table
from minigrid_tpu.core.types import EnvParams, pack_cell
from minigrid_tpu.envs import common as X
from minigrid_tpu.core.mission_space import MissionSpace, TemplateMission
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc

# mission indexed by (locked room color, key room color): locked color is
# used for both the key and the door (lockedroom.py:165-172)
MISSIONS = mission_table([
    f"get the {C.IDX_TO_COLOR[lc]} key from the {C.IDX_TO_COLOR[kc]} room, "
    f"unlock the {C.IDX_TO_COLOR[lc]} door and go to the goal"
    for lc in range(6) for kc in range(6)
])


class LockedRoomEnv(MiniGridEnv):
    name = "LockedRoom"
    __doc__ = env_doc(
        """
        Six rooms open onto a central hallway; one of them is locked and
        contains the green goal square, while another (named in the
        mission) holds the key. The agent must parse the instruction to
        find the key room, fetch the key, unlock the door and reach the
        goal — very hard for plain RL without the language cue.
        Reference: minigrid/envs/lockedroom.py.
        """,
        '"get the {lockedroom_color} key from the {keyroom_color} room, '
        'unlock the {door_color} door and go to the goal"',
        mission_notes="""
        Each color placeholder draws from "red", "green", "blue",
        "purple", "yellow" or "grey".
        """,
        used=(0, 1, 2, 3, 5),
        termination=("The agent reaches the goal.",
                     "Timeout (see `max_steps`)."),
    )

    def mission_space(self):
        """Reference lockedroom.py:83-86."""
        return MissionSpace(
            mission_func=TemplateMission(
                "get the {} key from the {} room, "
                "unlock the {} door and go to the goal", 3),
            ordered_placeholders=[C.COLOR_NAMES] * 3,
        )

    def __init__(self, size=19, max_steps=None, **kw):
        if max_steps is None:
            max_steps = 10 * size
        super().__init__(EnvParams(width=size, height=size, max_steps=max_steps, **kw))

    def _gen_grid(self, key):
        p = self.params
        w, h = p.width, p.height
        keys = jax.random.split(key, 12)
        l_idx = w // 2 - 2
        r_idx = w // 2 + 2

        grid = G.wall_rect(G.empty_grid(w, h), 0, 0, w, h)
        grid = G.vert_wall(grid, l_idx, 0)
        grid = G.vert_wall(grid, r_idx, 0)

        # 6 rooms: (side, n) with tops (0 | r_idx, n*(h//3)); door at
        # (wall_idx, top_y + 3) (lockedroom.py:123-135)
        room_tops = []
        door_pos = []
        for n in range(3):
            y = n * (h // 3)
            grid = G.horz_wall(grid, 0, y, l_idx)
            grid = G.fill_rect(grid, r_idx, y, w - r_idx, 1, X.WALL_CELL)
            room_tops.append((0, y))
            room_tops.append((r_idx, y))
            door_pos.append((l_idx, y + 3))
            door_pos.append((r_idx, y + 3))
        room_w = l_idx + 1
        room_h = h // 3 + 1
        room_tops = jnp.asarray(room_tops, jnp.int32)    # (6, 2)
        door_pos = jnp.asarray(door_pos, jnp.int32)      # (6, 2)

        locked_idx = jax.random.randint(keys[0], (), 0, 6)

        # goal at a random interior cell of the locked room (:137-139)
        gx = jax.random.randint(keys[1], (), 1, room_w - 1)
        gy = jax.random.randint(keys[2], (), 1, room_h - 1)
        goal = room_tops[locked_idx] + jnp.stack([gx, gy])
        grid = G.set_cell(grid, goal[0], goal[1], X.GOAL_CELL)

        # door colors: distinct, drawn from the sorted names (:142-151)
        colors = X.SORTED_COLOR_IDS[jax.random.permutation(keys[3], 6)]
        for r in range(6):
            state = jnp.where(locked_idx == r, C.LOCKED, C.CLOSED).astype(jnp.uint8)
            grid = G.set_cell(grid, door_pos[r, 0], door_pos[r, 1],
                              pack_cell(C.DOOR, colors[r], state))

        # key room != locked room (:154-158)
        shift = jax.random.randint(keys[4], (), 1, 6)
        key_idx = (locked_idx + shift) % 6
        kx = jax.random.randint(keys[5], (), 1, room_w - 1)
        ky = jax.random.randint(keys[6], (), 1, room_h - 1)
        key_pos = room_tops[key_idx] + jnp.stack([kx, ky])
        grid = G.set_cell(grid, key_pos[0], key_pos[1],
                          pack_cell(C.KEY, colors[locked_idx]))

        # agent in the hallway (:161-163)
        mask = G.free_mask(grid) & place.rect_mask(
            w, h, (l_idx, 0), (r_idx - l_idx, h))
        agent_pos = place.sample_from_mask(keys[7], mask)
        agent_dir = jax.random.randint(keys[8], (), 0, 4)

        mission = jnp.asarray(MISSIONS)[
            colors[locked_idx].astype(jnp.int32) * 6
            + colors[key_idx].astype(jnp.int32)
        ]
        return self.make_state(grid, agent_pos, agent_dir, rng=keys[9],
                               mission=mission)

"""ObstructedMaze environments (reference minigrid/envs/obstructedmaze.py and
obstructedmaze_v1.py).

Quest mazes: pick up the blue ball behind locked doors whose keys hide in
grey boxes, with green balls blocking doorways. The v1 variants place all
doors+blockers before any key so a blocker can never cover a key box
(obstructedmaze_v1.py:9-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import roomgrid as RG
from minigrid_tpu.core.mission import tokenize
from minigrid_tpu.core.types import pack_cell
from minigrid_tpu.core.mission_space import MissionSpace, TemplateMission
from minigrid_tpu.envs.roomgrid_base import PickupTargetMixin, RoomGridEnv
from minigrid_tpu.envs.envdoc import env_doc

# COLOR_NAMES[0..2] = blue, green, grey (obstructedmaze.py:114-120)
BALL_COLOR = C.COLOR_TO_IDX["blue"]
BLOCK_COLOR = C.COLOR_TO_IDX["green"]
BOX_COLOR = C.COLOR_TO_IDX["grey"]

SIDE_ROOMS = [(2, 1), (1, 2), (0, 1), (1, 0)]
CORNERS = [(2, 0), (2, 2), (0, 2), (0, 0)]


class ObstructedMazeEnv(PickupTargetMixin, RoomGridEnv):
    name = "ObstructedMaze"
    __doc__ = env_doc(
        """
        A blue ball is stashed in a corner of a (up to 3x3) maze of rooms
        whose connecting doors are locked; the matching keys hide inside
        boxes, and balls may sit in front of doors, blocking them. The
        agent must move blockers, open boxes, collect keys, unlock doors
        and finally pick up the blue ball — all without language cues.
        Reference: minigrid/envs/obstructedmaze.py and
        obstructedmaze_v1.py.
        """,
        '"pick up the blue ball"',
        used=(0, 1, 2, 3, 5),
        termination=("The agent picks up the blue ball.",
                     "Timeout (see `max_steps`)."),
        configurations="""
        Id suffix legend: ``NDl`` = number of locked doors; ``h`` = keys
        hidden in boxes; ``b`` = doors obstructed by balls; ``NQ`` =
        number of maze quarters carrying doors/keys; ``Full`` = the whole
        3x3 maze with both ``h`` and ``b``. The ``-v1`` ids fix the v0
        generator bug where the blocking ball could bury the key (only
        2Dlhb, 1Q, 2Q and Full need the fix; the other configurations
        cannot express it).
        """,
    )

    def mission_space(self):
        """Reference obstructedmaze.py:93-96."""
        return MissionSpace(
            mission_func=TemplateMission("pick up the {} ball", 1),
            ordered_placeholders=[[C.COLOR_NAMES[0]]],
        )

    def __init__(self, num_rows, num_cols, num_rooms_visited, max_steps=None, **kw):
        room_size = 6
        if max_steps is None:
            max_steps = 4 * num_rooms_visited * room_size**2
        super().__init__(room_size=room_size, num_rows=num_rows,
                         num_cols=num_cols, max_steps=max_steps, **kw)

    def default_mission(self) -> str:
        return "pick up the blue ball"

    def _target_extra(self):
        return {
            "target_type": jnp.asarray(C.BALL, jnp.uint8),
            "target_color": jnp.asarray(BALL_COLOR, jnp.uint8),
        }

    def _door_colors(self, key):
        """Random permutation of the 6 sorted color names
        (obstructedmaze.py:114 via _rand_subset)."""
        sorted_ids = jnp.asarray(
            [C.COLOR_TO_IDX[n] for n in C.COLOR_NAMES], jnp.uint8
        )
        return sorted_ids[jax.random.permutation(key, 6)]

    def _add_door(self, b, key, i, j, door_idx, color, locked=False,
                  key_in_box=False, blocked=False, with_key=True):
        """Door + optional blocker ball + optional (boxed) key
        (obstructedmaze.py:134-166; v1's add_locked_door skips the key,
        obstructedmaze_v1.py:77-92)."""
        k_door, k_key = jax.random.split(key)
        b, door_color, pos = RG.add_door(b, self.layout, k_door, i, j,
                                         door_idx, color, locked=locked)
        if blocked:
            vec = C.DIR_TO_VEC[door_idx]
            b = b.replace(grid=G.set_cell(
                b.grid, pos[0] - int(vec[0]), pos[1] - int(vec[1]),
                pack_cell(C.BALL, BLOCK_COLOR),
            ))
        if locked and with_key:
            if key_in_box:
                cell = pack_cell(C.BOX, BOX_COLOR, 0, C.KEY, door_color)
            else:
                cell = pack_cell(C.KEY, door_color)
            b, _ = RG.place_in_room(b, self.layout, k_key, i, j, cell)
        return b


class ObstructedMaze_1Dlhb(ObstructedMazeEnv):
    """2x1 maze variant (obstructedmaze.py:169-196)."""

    def __init__(self, key_in_box=True, blocked=True, **kw):
        super().__init__(num_rows=1, num_cols=2, num_rooms_visited=2, **kw)
        self.key_in_box = key_in_box
        self.blocked = blocked

    def _gen_grid(self, key):
        L = self.layout
        keys = jax.random.split(key, 6)
        b = RG.init_builder(L, keys[0])
        door_colors = self._door_colors(keys[1])
        b = self._add_door(b, keys[2], 0, 0, 0, door_colors[0], locked=True,
                           key_in_box=self.key_in_box, blocked=self.blocked)
        b, _, _, _ = RG.add_object(b, L, keys[3], 1, 0, kind=1, color=BALL_COLOR)
        b = RG.place_agent(b, L, keys[4], 0, 0)
        return self.finish(b, keys[5], extra=self._target_extra())


class ObstructedMaze_Full(ObstructedMazeEnv):
    """3x3 maze with quarters (obstructedmaze.py:198-255); set
    ``v1=True`` for the fixed placement order (obstructedmaze_v1.py)."""

    def __init__(self, agent_room=(1, 1), key_in_box=True, blocked=True,
                 num_quarters=4, num_rooms_visited=25, v1=False, **kw):
        super().__init__(num_rows=3, num_cols=3,
                         num_rooms_visited=num_rooms_visited, **kw)
        self.agent_room = agent_room
        self.key_in_box = key_in_box
        self.blocked = blocked
        self.num_quarters = num_quarters
        self.v1 = v1

    def _gen_grid(self, key):
        L = self.layout
        keys = jax.random.split(key, 6 * self.num_quarters + 5)
        b = RG.init_builder(L, keys[0])
        door_colors = self._door_colors(keys[1])

        ki = 2
        for q in range(self.num_quarters):
            si, sj = SIDE_ROOMS[q]
            b, _, _ = RG.add_door(b, L, keys[ki], 1, 1, q, door_colors[q],
                                  locked=False)
            ki += 1
            if self.v1:
                # v1: all locked doors + blockers first, then keys
                # (obstructedmaze_v1.py:52-67)
                for k in (-1, 1):
                    b = self._add_door(
                        b, keys[ki], si, sj, (q + k) % 4,
                        door_colors[(q + k) % 6], locked=True,
                        blocked=self.blocked, with_key=False,
                    )
                    ki += 1
                for k in (-1, 1):
                    color = door_colors[(q + k) % 6]
                    if self.key_in_box:
                        cell = pack_cell(C.BOX, BOX_COLOR, 0, C.KEY, color)
                    else:
                        cell = pack_cell(C.KEY, color)
                    b, _ = RG.place_in_room(b, L, jax.random.fold_in(keys[ki], k + 1),
                                            si, sj, cell)
                ki += 1
            else:
                for k in (-1, 1):
                    b = self._add_door(
                        b, keys[ki], si, sj, (q + k) % 4,
                        door_colors[(q + k) % 6], locked=True,
                        key_in_box=self.key_in_box, blocked=self.blocked,
                    )
                    ki += 1

        corner = jax.random.randint(keys[-3], (), 0, self.num_quarters)
        corners = jnp.asarray(CORNERS[: self.num_quarters], jnp.int32)
        ci, cj = corners[corner, 0], corners[corner, 1]
        b, _, _, _ = RG.add_object(b, L, keys[-2], ci, cj, kind=1,
                                   color=BALL_COLOR)
        b = RG.place_agent(b, L, keys[-4], self.agent_room[0], self.agent_room[1])
        return self.finish(b, keys[-1], extra=self._target_extra())

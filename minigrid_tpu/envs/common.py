"""Shared cell constants/constructors for environment generators."""

from __future__ import annotations

import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.types import pack_cell

GREEN = C.COLOR_TO_IDX["green"]
BLUE = C.COLOR_TO_IDX["blue"]
RED = C.COLOR_TO_IDX["red"]
YELLOW = C.COLOR_TO_IDX["yellow"]
PURPLE = C.COLOR_TO_IDX["purple"]
GREY = C.COLOR_TO_IDX["grey"]

GOAL_CELL = pack_cell(C.GOAL, GREEN)
LAVA_CELL = pack_cell(C.LAVA, RED)
WALL_CELL = jnp.asarray(C.WALL_CELL)
EMPTY_CELL = jnp.asarray(C.EMPTY_CELL)


def door(color, state=C.CLOSED):
    return pack_cell(C.DOOR, color, state)


def key(color):
    return pack_cell(C.KEY, color)


def ball(color):
    return pack_cell(C.BALL, color)


def box(color, cont_type=0, cont_color=0):
    return pack_cell(C.BOX, color, 0, cont_type, cont_color)


# Colors in sorted-name order (blue, green, grey, purple, red, yellow) —
# the order used by ``_rand_color``/``_rand_elem(sorted(...))`` draws
# (minigrid_env.py:294-299, envs/multiroom.py:174).
SORTED_COLOR_IDS = jnp.asarray(
    [C.COLOR_TO_IDX[name] for name in C.COLOR_NAMES], jnp.uint8
)

"""Functional rooms-and-doors builder.

Re-design of the reference ``RoomGrid`` base class
(``minigrid/core/roomgrid.py:66-438``). The reference threads mutable
``Room`` objects with door/neighbor references through generation; here a
:class:`Builder` pytree carries the grid plus fixed-shape door tables:

* ``door_pos_r[j, i]`` — wall slot between room (i, j) and (i+1, j)
* ``door_pos_d[j, i]`` — wall slot between room (i, j) and (i, j+1)
* ``doors_r`` / ``doors_d`` — 1 where a door/opening connects the rooms
* ``locked`` — per-room locked flag (roomgrid.py:260)
* ``combo_used`` — (3*6,) (kind, color) pairs present, for unique
  distractor sampling (roomgrid.py:407-422)

Every operation is jit/vmap-compatible with traced room indices, and the
unbounded rejection loops (``connect_all`` roomgrid.py:336-394, distractor
resampling) become bounded ``lax.while_loop``s / categorical draws over
masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.types import pack_cell

KIND_IDS = jnp.asarray([C.KEY, C.BALL, C.BOX], jnp.uint8)  # ["key","ball","box"]


@struct.dataclass
class Builder:
    grid: jax.Array
    agent_pos: jax.Array
    agent_dir: jax.Array
    door_pos_r: jax.Array  # (R, max(C-1,1), 2) int32
    door_pos_d: jax.Array  # (max(R-1,1), C, 2) int32
    doors_r: jax.Array     # (R, max(C-1,1)) int8
    doors_d: jax.Array     # (max(R-1,1), C) int8
    locked: jax.Array      # (R, C) bool
    combo_used: jax.Array  # (18,) bool


class RoomLayout:
    """Static geometry of a RoomGrid configuration."""

    def __init__(self, room_size: int, num_rows: int, num_cols: int):
        assert room_size >= 3
        self.room_size = room_size
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.width = (room_size - 1) * num_cols + 1
        self.height = (room_size - 1) * num_rows + 1

    def room_top(self, i, j):
        rs = self.room_size - 1
        return jnp.asarray(i) * rs, jnp.asarray(j) * rs

    def room_rect_mask(self, i, j):
        """(W, H) mask of room (i, j) incl. its walls (roomgrid.py:135-138)."""
        tx, ty = self.room_top(i, j)
        return place.rect_mask(self.width, self.height,
                               (tx, ty), (self.room_size, self.room_size))

    def room_from_pos(self, pos):
        rs = self.room_size - 1
        return pos[0] // rs, pos[1] // rs


def init_builder(layout: RoomLayout, key) -> Builder:
    """Draw walls and sample door slots (roomgrid.py:123-179)."""
    L = layout
    grid = G.empty_grid(L.width, L.height)
    rs = L.room_size
    for j in range(L.num_rows):
        for i in range(L.num_cols):
            grid = G.wall_rect(grid, i * (rs - 1), j * (rs - 1), rs, rs)

    nr = max(L.num_cols - 1, 1)
    nd = max(L.num_rows - 1, 1)
    k_r, k_d = jax.random.split(key)
    # right-door slot: x = x_m, y ~ U[y_l, y_m) (roomgrid.py:159-161)
    ys = jax.random.randint(k_r, (L.num_rows, nr), 1, rs - 1)
    xs_r = (jnp.arange(nr) + 1) * (rs - 1)
    door_pos_r = jnp.stack(
        [jnp.broadcast_to(xs_r, (L.num_rows, nr)),
         ys + (jnp.arange(L.num_rows)[:, None]) * (rs - 1)], axis=-1
    ).astype(jnp.int32)
    # down-door slot: y = y_m, x ~ U[x_l, x_m) (roomgrid.py:162-164)
    xs = jax.random.randint(k_d, (nd, L.num_cols), 1, rs - 1)
    ys_d = (jnp.arange(nd) + 1) * (rs - 1)
    door_pos_d = jnp.stack(
        [xs + (jnp.arange(L.num_cols)[None, :]) * (rs - 1),
         jnp.broadcast_to(ys_d[:, None], (nd, L.num_cols))], axis=-1
    ).astype(jnp.int32)

    # agent at the center of the middle room, facing right (:172-179)
    cx = (L.num_cols // 2) * (rs - 1) + rs // 2
    cy = (L.num_rows // 2) * (rs - 1) + rs // 2
    return Builder(
        grid=grid,
        agent_pos=jnp.asarray([cx, cy], jnp.int32),
        agent_dir=jnp.zeros((), jnp.int32),
        door_pos_r=door_pos_r,
        door_pos_d=door_pos_d,
        doors_r=jnp.zeros((L.num_rows, nr), jnp.int8),
        doors_d=jnp.zeros((nd, L.num_cols), jnp.int8),
        locked=jnp.zeros((L.num_rows, L.num_cols), bool),
        combo_used=jnp.zeros(18, bool),
    )


def _door_slot(b: Builder, i, j, door_idx):
    """Canonical (is_right_table, jj, ii, pos) for a room's wall index.

    Wall order is right, down, left, up (roomgrid.py:31)."""
    door_idx = jnp.asarray(door_idx)
    is_r = (door_idx % 2) == 0
    ii_r = jnp.where(door_idx == 0, i, i - 1)
    jj_d = jnp.where(door_idx == 1, j, j - 1)
    pos = jnp.where(
        is_r, b.door_pos_r[j, ii_r], b.door_pos_d[jj_d, i]
    )
    return is_r, ii_r, jj_d, pos


def has_neighbor(layout: RoomLayout, i, j, door_idx):
    door_idx = jnp.asarray(door_idx)
    return jnp.where(
        door_idx == 0, i < layout.num_cols - 1,
        jnp.where(door_idx == 1, j < layout.num_rows - 1,
                  jnp.where(door_idx == 2, i > 0, j > 0)))


def door_exists(b: Builder, i, j, door_idx):
    is_r, ii_r, jj_d, _ = _door_slot(b, i, j, door_idx)
    return jnp.where(is_r, b.doors_r[j, ii_r], b.doors_d[jj_d, i]) > 0


def _mark_door(b: Builder, i, j, door_idx) -> Builder:
    # one-hot blends, NOT .at[] scatters: narrow-dtype traced-index
    # scatters corrupt at large vmap batch on TPU (grid.py onehot_set)
    is_r, ii_r, jj_d, _ = _door_slot(b, i, j, door_idx)
    doors_r = G.onehot_set(b.doors_r, (j, ii_r), jnp.int8(1), pred=is_r)
    doors_d = G.onehot_set(b.doors_d, (jj_d, i), jnp.int8(1), pred=~is_r)
    return b.replace(doors_r=doors_r, doors_d=doors_d)


def add_door(b: Builder, layout: RoomLayout, key, i, j, door_idx=None,
             color=None, locked=None):
    """Place a door connecting room (i, j) to its neighbor
    (roomgrid.py:230-274). Returns (builder, color, pos)."""
    k_idx, k_color, k_locked = jax.random.split(key, 3)
    if door_idx is None:
        valid = jnp.stack([
            has_neighbor(layout, i, j, d) & ~door_exists(b, i, j, d)
            for d in range(4)
        ])
        door_idx = jax.random.categorical(
            k_idx, jnp.where(valid, 0.0, place.NEG)
        )
    if color is None:
        color = jax.random.randint(k_color, (), 0, 6)[None].squeeze()
        color = _sorted_color(color)
    if locked is None:
        locked = jax.random.randint(k_locked, (), 0, 2) == 0

    locked = jnp.asarray(locked)
    _, _, _, pos = _door_slot(b, i, j, door_idx)
    state = jnp.where(locked, C.LOCKED, C.CLOSED).astype(jnp.uint8)
    grid = G.set_cell(b.grid, pos[0], pos[1], pack_cell(C.DOOR, color, state))
    b = b.replace(grid=grid,
                  locked=G.onehot_set(b.locked, (j, i), locked))
    b = _mark_door(b, i, j, door_idx)
    return b, jnp.asarray(color, jnp.uint8), pos


def remove_wall(b: Builder, layout: RoomLayout, i, j, wall_idx) -> Builder:
    """Open a whole wall between two rooms (roomgrid.py:276-311)."""
    rs = layout.room_size
    tx, ty = layout.room_top(i, j)
    if wall_idx == 0:
        b = b.replace(grid=G.fill_rect(b.grid, tx + rs - 1, ty + 1, 1, rs - 2,
                                       C.EMPTY_CELL))
    elif wall_idx == 1:
        b = b.replace(grid=G.fill_rect(b.grid, tx + 1, ty + rs - 1, rs - 2, 1,
                                       C.EMPTY_CELL))
    elif wall_idx == 2:
        b = b.replace(grid=G.fill_rect(b.grid, tx, ty + 1, 1, rs - 2,
                                       C.EMPTY_CELL))
    elif wall_idx == 3:
        b = b.replace(grid=G.fill_rect(b.grid, tx + 1, ty, rs - 2, 1,
                                       C.EMPTY_CELL))
    else:
        raise AssertionError("invalid wall index")
    return _mark_door(b, i, j, wall_idx)


def place_in_room(b: Builder, layout: RoomLayout, key, i, j, cell):
    """Place a cell in room (i, j), not orthogonally next to the agent
    (roomgrid.py:181-196 with reject_next_to :11-20)."""
    xs, ys = G.coord_grids(layout.width, layout.height)
    manhattan = jnp.abs(xs - b.agent_pos[0]) + jnp.abs(ys - b.agent_pos[1])
    mask = (
        G.free_mask(b.grid)
        & layout.room_rect_mask(i, j)
        & (manhattan >= 2)
        & ~((xs == b.agent_pos[0]) & (ys == b.agent_pos[1]))
    )
    pos = place.sample_from_mask(key, mask)
    return b.replace(grid=G.set_cell(b.grid, pos[0], pos[1], cell)), pos


def add_object(b: Builder, layout: RoomLayout, key, i, j, kind=None, color=None):
    """Add key/ball/box to a room (roomgrid.py:198-228).

    Returns (builder, kind_idx, color_idx, pos); kind_idx indexes KIND_IDS.
    """
    k_kind, k_color, k_place = jax.random.split(key, 3)
    if kind is None:
        kind = jax.random.randint(k_kind, (), 0, 3)
    if color is None:
        color = _sorted_color(jax.random.randint(k_color, (), 0, 6))
    kind = jnp.asarray(kind)
    color = jnp.asarray(color, jnp.uint8)
    cell = pack_cell(KIND_IDS[kind], color)
    b, pos = place_in_room(b, layout, k_place, i, j, cell)
    b = b.replace(combo_used=b.combo_used
                  | (jnp.arange(18) == kind * 6 + color))
    return b, kind, color, pos


def _sorted_color(idx):
    """_rand_color draws from alphabetically sorted names
    (minigrid_env.py:294-299); map a uniform index through that order."""
    table = jnp.asarray([C.COLOR_TO_IDX[n] for n in C.COLOR_NAMES], jnp.uint8)
    return table[idx]


def place_agent(b: Builder, layout: RoomLayout, key, i=None, j=None,
                rand_dir=True) -> Builder:
    """Agent placement, never facing an object (roomgrid.py:313-334)."""
    k_ij, k_pos = jax.random.split(key)
    if i is None:
        i = jax.random.randint(jax.random.fold_in(k_ij, 0), (), 0, layout.num_cols)
    if j is None:
        j = jax.random.randint(jax.random.fold_in(k_ij, 1), (), 0, layout.num_rows)

    W, H = layout.width, layout.height
    room = layout.room_rect_mask(i, j)
    free = G.free_mask(b.grid) & room

    # front cell must be empty or wall (roomgrid.py:330-332)
    t = b.grid[..., 0]
    front_ok = []
    for d in range(4):
        dx, dy = int(C.DIR_TO_VEC[d][0]), int(C.DIR_TO_VEC[d][1])
        shifted = jnp.roll(t, shift=(-dx, -dy), axis=(0, 1))
        xs, ys = G.coord_grids(W, H)
        inb = (xs + dx >= 0) & (xs + dx < W) & (ys + dy >= 0) & (ys + dy < H)
        ok = jnp.where(inb, (shifted == C.EMPTY) | (shifted == C.WALL), True)
        front_ok.append(ok)
    front_ok = jnp.stack(front_ok, axis=-1)  # (W, H, 4)

    if rand_dir:
        valid = free[..., None] & front_ok
        logits = jnp.where(valid.reshape(-1), 0.0, place.NEG)
        flat = jax.random.categorical(k_pos, logits)
        d = flat % 4
        xy = flat // 4
        pos = jnp.stack([xy // H, xy % H]).astype(jnp.int32)
        return b.replace(agent_pos=pos, agent_dir=d.astype(jnp.int32))
    valid = free & jnp.take(front_ok, b.agent_dir, axis=-1)
    pos = place.sample_from_mask(k_pos, valid)
    return b.replace(agent_pos=pos)


def reachable_rooms(b: Builder, layout: RoomLayout) -> jax.Array:
    """(R, C) bool — rooms connected to the agent's room through existing
    doors/openings (the find_reach DFS, roomgrid.py:348-359)."""
    R, Cc = layout.num_rows, layout.num_cols
    i0, j0 = layout.room_from_pos(b.agent_pos)
    reach = (jnp.arange(R)[:, None] == j0) & (jnp.arange(Cc) == i0)
    open_r = (b.doors_r > 0) if Cc > 1 else jnp.zeros((R, 0), bool)
    open_d = (b.doors_d > 0) if R > 1 else jnp.zeros((0, Cc), bool)

    def body(_, reach):
        if Cc > 1:
            right = jnp.pad(reach[:, :-1] & open_r, ((0, 0), (1, 0)))
            left = jnp.pad(reach[:, 1:] & open_r, ((0, 0), (0, 1)))
        else:
            right = left = False
        if R > 1:
            down = jnp.pad(reach[:-1, :] & open_d, ((1, 0), (0, 0)))
            up = jnp.pad(reach[1:, :] & open_d, ((0, 1), (0, 0)))
        else:
            down = up = False
        return reach | right | left | down | up

    return jax.lax.fori_loop(0, R * Cc, body, reach)


def connect_all(b: Builder, layout: RoomLayout, key, door_color_ids=None,
                max_itrs: int = 5000, exclude_color=None) -> Builder:
    """Add random unlocked doors until every room is reachable
    (roomgrid.py:336-394), as a bounded while_loop.

    ``exclude_color`` (traced color id, or -1 for none) removes one color
    from the palette — the BabyAI Unlock level's door_colors filter
    (envs/babyai/unlock.py:63-66)."""
    R, Cc = layout.num_rows, layout.num_cols
    if door_color_ids is None:
        door_color_ids = [C.COLOR_TO_IDX[n] for n in C.COLOR_NAMES]
    colors = jnp.asarray(door_color_ids, jnp.uint8)

    def cond(carry):
        b, key, itr = carry
        return (~reachable_rooms(b, layout).all()) & (itr < max_itrs)

    def body(carry):
        b, key, itr = carry
        key, k_i, k_j, k_k, k_c = jax.random.split(key, 5)
        i = jax.random.randint(k_i, (), 0, Cc)
        j = jax.random.randint(k_j, (), 0, R)
        k = jax.random.randint(k_k, (), 0, 4)

        ok = has_neighbor(layout, i, j, k) & ~door_exists(b, i, j, k)
        ni = i + jnp.asarray(C.DIR_TO_VEC)[k][0]
        nj = j + jnp.asarray(C.DIR_TO_VEC)[k][1]
        ni_c = jnp.clip(ni, 0, Cc - 1)
        nj_c = jnp.clip(nj, 0, R - 1)
        ok &= ~b.locked[j, i] & ~b.locked[nj_c, ni_c]

        n_colors = len(door_color_ids)
        if exclude_color is None:
            color = colors[jax.random.randint(k_c, (), 0, n_colors)]
        else:
            excl = jnp.asarray(exclude_color, jnp.int32)
            has_excl = (colors.astype(jnp.int32) == excl).any()
            excl_pos = jnp.argmax(colors.astype(jnp.int32) == excl)
            j_full = jax.random.randint(k_c, (), 0, n_colors)
            j_less = jax.random.randint(k_c, (), 0, n_colors - 1)
            j_less = j_less + (j_less >= excl_pos)
            color = colors[jnp.where(has_excl, j_less, j_full)]
        is_r, ii_r, jj_d, pos = _door_slot(b, i, j, k)
        cell = pack_cell(C.DOOR, color, C.CLOSED)
        # blends, not scatters (grid.py onehot_set): x=-1 writes nothing
        grid = G.set_cell(b.grid, jnp.where(ok, pos[0], -1), pos[1], cell)
        doors_r = G.onehot_set(b.doors_r, (j, ii_r), jnp.int8(1),
                               pred=ok & is_r)
        doors_d = G.onehot_set(b.doors_d, (jj_d, i), jnp.int8(1),
                               pred=ok & ~is_r)
        return (b.replace(grid=grid, doors_r=doors_r, doors_d=doors_d),
                key, itr + 1)

    b, _, _ = jax.lax.while_loop(cond, body, (b, key, jnp.zeros((), jnp.int32)))
    return b


def add_distractors(b: Builder, layout: RoomLayout, key, i=None, j=None,
                    num_distractors: int = 10, all_unique: bool = True):
    """Scatter random objects (roomgrid.py:396-438). Returns
    (builder, kinds, colors, positions) arrays of length num_distractors.

    One ``lax.scan`` over the distractor index, not an unrolled Python
    loop: the body (combo draw + full-grid masked placement) is identical
    per object, so unrolling multiplied the level generators' HLO by the
    distractor count — the dominant term in BabyAI gen compile time
    (BossLevel places up to 18 per mission)."""
    if num_distractors == 0:
        return (b, jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.uint8),
                jnp.zeros((0, 2), jnp.int32))

    def body(b, k):
        k_combo, k_room, k_place = jax.random.split(k, 3)
        if all_unique:
            combo = jax.random.categorical(
                k_combo, jnp.where(b.combo_used, place.NEG, 0.0)
            )
        else:
            combo = jax.random.randint(k_combo, (), 0, 18)
        kind, color = combo // 6, (combo % 6).astype(jnp.uint8)
        ri = i if i is not None else jax.random.randint(
            jax.random.fold_in(k_room, 0), (), 0, layout.num_cols)
        rj = j if j is not None else jax.random.randint(
            jax.random.fold_in(k_room, 1), (), 0, layout.num_rows)
        cell = pack_cell(KIND_IDS[kind], color)
        b, pos = place_in_room(b, layout, k_place, ri, rj, cell)
        b = b.replace(combo_used=b.combo_used | (jnp.arange(18) == combo))
        return b, (kind, color, pos)

    b, (kinds, colors, positions) = jax.lax.scan(
        body, b, jax.random.split(key, num_distractors))
    return b, kinds, colors, positions

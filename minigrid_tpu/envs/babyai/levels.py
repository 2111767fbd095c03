"""The 40 BabyAI level classes (reference minigrid/envs/babyai/{goto,open,
pickup,putnext,unlock,other,synth}.py), built on the functional RoomGrid
builder and the array instruction encoding."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import roomgrid as RG
from minigrid_tpu.core.types import pack_cell
from minigrid_tpu.envs.babyai.core import instrs as I
from minigrid_tpu.envs.babyai.core import level as L
from minigrid_tpu.envs.babyai.core.level import (
    RoomGridLevel,
    after_instr,
    and_instr,
    before_instr,
    desc,
    desc_from_kind_color,
    leaf,
    single,
)
from minigrid_tpu.envs.babyai.core.levelgen import LevelGen, add_locked_room

RED = C.COLOR_TO_IDX["red"]
BLUE = C.COLOR_TO_IDX["blue"]
GREY = C.COLOR_TO_IDX["grey"]
BALL_T, BOX_T, KEY_T, DOOR_T = 1, 0, 2, 3  # OBJ_TYPES indices


def pick_dist(key, kinds, colors):
    """Uniform choice among placed distractors -> descriptor."""
    idx = jax.random.randint(key, (), 0, kinds.shape[0])
    return desc_from_kind_color(kinds[idx], colors[idx])


def sample_door_cell(b, key):
    """Uniform door cell -> (pos, color) (open.py:19-33 door listing)."""
    doors = b.grid[..., 0] == C.DOOR
    W, H = doors.shape
    flat = jax.random.categorical(
        key, jnp.where(doors.reshape(-1), 0.0, -1e9))
    pos = jnp.stack([flat // H, flat % H]).astype(jnp.int32)
    return pos, b.grid[pos[0], pos[1], 1].astype(jnp.int32)


def recolor_positions(b, positions, color):
    """Set the color channel at each position (GoToRedBallGrey,
    goto.py:72-73). Coordinate blend, not a scatter (grid.py onehot_set
    rationale): one dense membership test over all positions."""
    grid = b.grid
    xs, ys = G.coord_grids(grid.shape[0], grid.shape[1])
    hit = ((xs[..., None] == positions[:, 0])
           & (ys[..., None] == positions[:, 1])).any(-1)
    ch1 = jnp.where(hit, jnp.asarray(color, jnp.uint8), grid[..., 1])
    return b.replace(grid=jnp.concatenate(
        [grid[..., :1], ch1[..., None], grid[..., 2:]], axis=-1))


# ---------------------------------------------------------------------------
# GoTo family (goto.py)
# ---------------------------------------------------------------------------

class GoToRedBallGrey(RoomGridLevel):
    def __init__(self, room_size=8, num_dists=7, **kw):
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kw)
        self.num_dists = num_dists

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        b = RG.place_agent(b, self.layout, keys[0], 0, 0)
        b, _ = RG.place_in_room(b, self.layout, keys[1], 0, 0,
                                pack_cell(C.BALL, RED))
        b, _, _, pos = RG.add_distractors(b, self.layout, keys[2], 0, 0,
                                          self.num_dists, all_unique=False)
        b = recolor_positions(b, pos, GREY)
        ok = L.check_objs_reachable(b)
        return b, single(leaf(I.GOTO, desc(BALL_T, RED))), ok


class GoToRedBall(RoomGridLevel):
    def __init__(self, room_size=8, num_dists=7, **kw):
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kw)
        self.num_dists = num_dists

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 3)
        b = RG.place_agent(b, self.layout, keys[0], 0, 0)
        b, _ = RG.place_in_room(b, self.layout, keys[1], 0, 0,
                                pack_cell(C.BALL, RED))
        b, _, _, _ = RG.add_distractors(b, self.layout, keys[2], 0, 0,
                                        self.num_dists, all_unique=False)
        ok = L.check_objs_reachable(b)
        return b, single(leaf(I.GOTO, desc(BALL_T, RED))), ok


class GoToRedBallNoDists(GoToRedBall):
    def __init__(self, **kw):
        super().__init__(room_size=8, num_dists=0, **kw)


class GoToObj(RoomGridLevel):
    def __init__(self, room_size=8, **kw):
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 2)
        b = RG.place_agent(b, self.layout, keys[0], 0, 0)
        b, kinds, colors, _ = RG.add_distractors(b, self.layout, keys[1],
                                                 num_distractors=1)
        return b, single(leaf(I.GOTO, desc_from_kind_color(kinds[0], colors[0]))), \
            jnp.ones((), bool)


class GoToLocal(RoomGridLevel):
    def __init__(self, room_size=8, num_dists=8, **kw):
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kw)
        self.num_dists = num_dists

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 3)
        b = RG.place_agent(b, self.layout, keys[0], 0, 0)
        b, kinds, colors, _ = RG.add_distractors(
            b, self.layout, keys[1], num_distractors=self.num_dists,
            all_unique=False)
        ok = L.check_objs_reachable(b)
        return b, single(leaf(I.GOTO, pick_dist(keys[2], kinds, colors))), ok


class GoTo(RoomGridLevel):
    def __init__(self, room_size=8, num_rows=3, num_cols=3, num_dists=18,
                 doors_open=False, **kw):
        super().__init__(num_rows=num_rows, num_cols=num_cols,
                         room_size=room_size, **kw)
        self.num_dists = num_dists
        self.doors_open = doors_open

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        b = RG.place_agent(b, self.layout, keys[0])
        b = RG.connect_all(b, self.layout, keys[1])
        b, kinds, colors, _ = RG.add_distractors(
            b, self.layout, keys[2], num_distractors=self.num_dists,
            all_unique=False)
        ok = L.check_objs_reachable(b)
        if self.doors_open:
            b = L.open_all_doors(b)
        return b, single(leaf(I.GOTO, pick_dist(keys[3], kinds, colors))), ok


class GoToImpUnlock(RoomGridLevel):
    def gen_mission(self, key, b):
        Lt = self.layout
        keys = jax.random.split(key, 10)
        id_ = jax.random.randint(keys[0], (), 0, Lt.num_cols)
        jd = jax.random.randint(keys[1], (), 0, Lt.num_rows)
        b, door_color, _ = RG.add_door(b, Lt, keys[2], id_, jd, None,
                                       locked=True)
        ki, kj = L.sample_room(keys[3], Lt, exclude=(id_, jd))
        b, _, _, _ = RG.add_object(b, Lt, keys[4], ki, kj, kind=0,
                                   color=door_color)
        b = RG.connect_all(b, Lt, keys[5])
        # two distractors per non-locked room (goto.py:506-509)
        for i in range(Lt.num_cols):
            for j in range(Lt.num_rows):
                k = jax.random.fold_in(keys[6], i * 8 + j)
                nb, _, _, _ = RG.add_distractors(b, Lt, k, i, j, 2,
                                                 all_unique=False)
                skip = (jnp.asarray(i) == id_) & (jnp.asarray(j) == jd)
                b = jax.tree.map(lambda a, c: jnp.where(skip, a, c), b, nb)
        # agent outside the locked room
        flat = jax.random.categorical(
            keys[7],
            jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (Lt.num_rows, Lt.num_cols), 1)
                 == id_)
                & (jax.lax.broadcasted_iota(jnp.int32, (Lt.num_rows, Lt.num_cols), 0)
                   == jd), -1e9, 0.0).reshape(-1))
        b = RG.place_agent(b, Lt, keys[8], flat % Lt.num_cols,
                           flat // Lt.num_cols)
        ok = L.check_objs_reachable(b)
        b, kinds, colors, _ = RG.add_distractors(b, Lt, keys[9], id_, jd, 1,
                                                 all_unique=False)
        return b, single(leaf(I.GOTO, desc_from_kind_color(kinds[0], colors[0]))), ok


class GoToSeq(LevelGen):
    def __init__(self, room_size=8, num_rows=3, num_cols=3, num_dists=18, **kw):
        super().__init__(room_size=room_size, num_rows=num_rows,
                         num_cols=num_cols, num_dists=num_dists,
                         action_kinds=["goto"], locked_room_prob=0,
                         locations=False, unblocking=False, **kw)


class GoToRedBlueBall(RoomGridLevel):
    def __init__(self, room_size=8, num_dists=7, **kw):
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kw)
        self.num_dists = num_dists

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        b = RG.place_agent(b, self.layout, keys[0], 0, 0)
        b, kinds, colors, _ = RG.add_distractors(
            b, self.layout, keys[1], num_distractors=self.num_dists,
            all_unique=False)
        # no distractor may be a red or blue ball (goto.py:666-669)
        bad = ((kinds == 1) & ((colors == RED) | (colors == BLUE))).any()
        color = jnp.where(jax.random.randint(keys[2], (), 0, 2) == 0, RED, BLUE)
        b, _ = RG.place_in_room(b, self.layout, keys[3], 0, 0,
                                pack_cell(C.BALL, color))
        ok = ~bad & L.check_objs_reachable(b)
        return b, single(leaf(I.GOTO, desc(BALL_T, color))), ok


class GoToDoorLevel(RoomGridLevel):
    def __init__(self, **kw):
        super().__init__(room_size=7, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 6)
        colors = []
        for n in range(4):
            b, color, _ = RG.add_door(b, self.layout, keys[n], 1, 1, None)
            colors.append(color)
        b = RG.place_agent(b, self.layout, keys[4], 1, 1)
        pick = jax.random.randint(keys[5], (), 0, 4)
        color = jnp.stack(colors)[pick]
        return b, single(leaf(I.GOTO, desc(DOOR_T, color))), jnp.ones((), bool)


class GoToObjDoor(RoomGridLevel):
    def __init__(self, **kw):
        super().__init__(room_size=8, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 8)
        b = RG.place_agent(b, self.layout, keys[0], 1, 1)
        b, kinds, colors, _ = RG.add_distractors(b, self.layout, keys[1],
                                                 1, 1, 8, all_unique=False)
        types = jnp.asarray(
            [jnp.select([kinds[i] == 0, kinds[i] == 1], [KEY_T, BALL_T],
                        default=BOX_T) for i in range(8)])
        door_colors = []
        for n in range(4):
            b, dcolor, _ = RG.add_door(b, self.layout, keys[2 + n], 1, 1, None)
            door_colors.append(dcolor)
        all_types = jnp.concatenate([types, jnp.full(4, DOOR_T)])
        all_colors = jnp.concatenate(
            [colors.astype(jnp.int32),
             jnp.stack(door_colors).astype(jnp.int32)])
        ok = L.check_objs_reachable(b)
        pick = jax.random.randint(keys[6], (), 0, 12)
        return b, single(leaf(I.GOTO, desc(all_types[pick], all_colors[pick]))), ok


# ---------------------------------------------------------------------------
# Open family (open.py)
# ---------------------------------------------------------------------------

class Open(RoomGridLevel):
    def gen_mission(self, key, b):
        keys = jax.random.split(key, 5)
        b = RG.place_agent(b, self.layout, keys[0])
        b = RG.connect_all(b, self.layout, keys[1])
        b, _, _, _ = RG.add_distractors(b, self.layout, keys[2],
                                        num_distractors=18, all_unique=False)
        ok = L.check_objs_reachable(b)
        _, color = sample_door_cell(b, keys[3])
        return b, single(leaf(I.OPEN, desc(DOOR_T, color))), ok


class OpenRedDoor(RoomGridLevel):
    def __init__(self, **kw):
        super().__init__(num_rows=1, num_cols=2, room_size=5, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 2)
        b, _, _ = RG.add_door(b, self.layout, keys[0], 0, 0, 0, color=RED,
                              locked=False)
        b = RG.place_agent(b, self.layout, keys[1], 0, 0)
        return b, single(leaf(I.OPEN, desc(DOOR_T, RED))), jnp.ones((), bool)


class OpenDoor(RoomGridLevel):
    def __init__(self, debug=False, select_by=None, **kw):
        super().__init__(**kw)
        self.select_by = select_by
        self.debug = debug

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 5)
        door_colors = RG._sorted_color(jax.random.permutation(keys[0], 6)[:4])
        for i in range(4):
            b, _, _ = RG.add_door(b, self.layout, jax.random.fold_in(keys[1], i),
                                  1, 1, i, color=door_colors[i], locked=False)
        select_by = self.select_by
        if select_by is None:
            by_color = jax.random.randint(keys[2], (), 0, 2) == 0
        else:
            by_color = jnp.asarray(select_by == "color")
        loc = jax.random.randint(keys[3], (), 0, 4)
        d = (jnp.asarray(DOOR_T, jnp.int32),
             jnp.where(by_color, door_colors[0].astype(jnp.int32), I.COLOR_NONE),
             jnp.where(by_color, I.LOC_NONE, loc))
        b = RG.place_agent(b, self.layout, keys[4], 1, 1)
        return b, single(leaf(I.OPEN, d, strict=self.debug)), jnp.ones((), bool)


class OpenTwoDoors(RoomGridLevel):
    def __init__(self, first_color=None, second_color=None, strict=False,
                 max_steps=None, **kw):
        room_size = 6
        if max_steps is None:
            max_steps = 20 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kw)
        self.first_color = first_color
        self.second_color = second_color
        self.strict = strict

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        colors = RG._sorted_color(jax.random.permutation(keys[0], 6)[:2])
        first = (jnp.asarray(C.COLOR_TO_IDX[self.first_color], jnp.int32)
                 if self.first_color else colors[0].astype(jnp.int32))
        second = (jnp.asarray(C.COLOR_TO_IDX[self.second_color], jnp.int32)
                  if self.second_color else colors[1].astype(jnp.int32))
        b, _, _ = RG.add_door(b, self.layout, keys[1], 1, 1, 2, color=first,
                              locked=False)
        b, _, _ = RG.add_door(b, self.layout, keys[2], 1, 1, 0, color=second,
                              locked=False)
        b = RG.place_agent(b, self.layout, keys[3], 1, 1)
        spec = before_instr(
            [leaf(I.OPEN, desc(DOOR_T, first), strict=self.strict)],
            [leaf(I.OPEN, desc(DOOR_T, second))],
        )
        return b, spec, jnp.ones((), bool)


class OpenDoorsOrder(RoomGridLevel):
    def __init__(self, num_doors, debug=False, max_steps=None, **kw):
        assert num_doors >= 2
        room_size = 6
        if max_steps is None:
            max_steps = 20 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kw)
        self.num_doors = num_doors
        self.debug = debug

    def gen_mission(self, key, b):
        keys = jax.random.split(key, self.num_doors + 4)
        colors = RG._sorted_color(
            jax.random.permutation(keys[0], 6)[: self.num_doors])
        for i in range(self.num_doors):
            b, _, _ = RG.add_door(b, self.layout, keys[1 + i], 1, 1, None,
                                  color=colors[i], locked=False)
        b = RG.place_agent(b, self.layout, keys[-3], 1, 1)
        perm = jax.random.permutation(keys[-2], self.num_doors)[:2]
        d1 = desc(DOOR_T, colors[perm[0]].astype(jnp.int32))
        d2 = desc(DOOR_T, colors[perm[1]].astype(jnp.int32))
        mode = jax.random.randint(keys[-1], (), 0, 3)
        l1 = leaf(I.OPEN, d1, strict=self.debug)
        l2 = leaf(I.OPEN, d2, strict=self.debug)
        # mode 0: single; 1: before; 2: after (open.py:327-...)
        spec = seq_or_single(mode, l1, l2)
        return b, spec, jnp.ones((), bool)


def seq_or_single(mode, l1, l2):
    """Runtime-select between single(l1), before(l1,l2), after(l1,l2)."""
    spec = before_instr([l1], [l2])
    root = jnp.select(
        [mode == 0, mode == 1], [I.ROOT_ACTION, I.ROOT_BEFORE],
        default=I.ROOT_AFTER).astype(jnp.int32)
    leaves = list(spec["leaves"])
    leaves[2] = {**leaves[2],
                 "kind": jnp.where(mode == 0, I.UNUSED, leaves[2]["kind"])}
    return {**spec, "root": root, "leaves": leaves}


# ---------------------------------------------------------------------------
# Pickup family (pickup.py)
# ---------------------------------------------------------------------------

class Pickup(RoomGridLevel):
    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        b = RG.place_agent(b, self.layout, keys[0])
        b = RG.connect_all(b, self.layout, keys[1])
        b, kinds, colors, _ = RG.add_distractors(
            b, self.layout, keys[2], num_distractors=18, all_unique=False)
        ok = L.check_objs_reachable(b)
        return b, single(leaf(I.PICKUP, pick_dist(keys[3], kinds, colors))), ok


class UnblockPickup(RoomGridLevel):
    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        b = RG.place_agent(b, self.layout, keys[0])
        b = RG.connect_all(b, self.layout, keys[1])
        b, kinds, colors, _ = RG.add_distractors(
            b, self.layout, keys[2], num_distractors=20, all_unique=False)
        # require that unblocking IS needed (pickup.py:84-86)
        ok = ~L.check_objs_reachable(b)
        return b, single(leaf(I.PICKUP, pick_dist(keys[3], kinds, colors))), ok


class PickupLoc(LevelGen):
    def __init__(self, **kw):
        super().__init__(action_kinds=["pickup"], instr_kinds=["action"],
                         num_rows=1, num_cols=1, num_dists=8,
                         locked_room_prob=0, locations=True, unblocking=False,
                         **kw)


class PickupDist(RoomGridLevel):
    def __init__(self, debug=False, **kw):
        super().__init__(num_rows=1, num_cols=1, room_size=7, **kw)
        self.debug = debug

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        b, kinds, colors, _ = RG.add_distractors(b, self.layout, keys[0],
                                                 num_distractors=5)
        b = RG.place_agent(b, self.layout, keys[1], 0, 0)
        idx = jax.random.randint(keys[2], (), 0, 5)
        d = desc_from_kind_color(kinds[idx], colors[idx])
        # select_by: 0=type (drop color), 1=color (drop type), 2=both
        sel = jax.random.randint(keys[3], (), 0, 3)
        dtype = jnp.where(sel == 1, I.TYPE_NONE, d[0])
        dcolor = jnp.where(sel == 0, I.COLOR_NONE, d[1])
        return b, single(leaf(I.PICKUP, (dtype, dcolor, d[2]),
                              strict=self.debug)), jnp.ones((), bool)


class PickupAbove(RoomGridLevel):
    def __init__(self, max_steps=None, **kw):
        room_size = 6
        if max_steps is None:
            max_steps = 8 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        b, kind, color, _ = RG.add_object(b, self.layout, keys[0], 1, 0)
        b, _, _ = RG.add_door(b, self.layout, keys[1], 1, 1, 3, locked=False)
        b = RG.place_agent(b, self.layout, keys[2], 1, 1)
        b = RG.connect_all(b, self.layout, keys[3])
        return b, single(leaf(I.PICKUP, desc_from_kind_color(kind, color))), \
            jnp.ones((), bool)


# ---------------------------------------------------------------------------
# PutNext family (putnext.py)
# ---------------------------------------------------------------------------

class PutNextLocal(RoomGridLevel):
    def __init__(self, room_size=8, num_objs=8, **kw):
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kw)
        self.num_objs = num_objs

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 3)
        b = RG.place_agent(b, self.layout, keys[0], 0, 0)
        b, kinds, colors, _ = RG.add_distractors(
            b, self.layout, keys[1], num_distractors=self.num_objs,
            all_unique=True)
        ok = L.check_objs_reachable(b)
        perm = jax.random.permutation(keys[2], self.num_objs)[:2]
        d1 = desc_from_kind_color(kinds[perm[0]], colors[perm[0]])
        d2 = desc_from_kind_color(kinds[perm[1]], colors[perm[1]])
        return b, single(leaf(I.PUTNEXT, d1, d2)), ok


class PutNext(RoomGridLevel):
    def __init__(self, room_size, objs_per_room, start_carrying=False,
                 max_steps=None, **kw):
        assert room_size >= 4 and objs_per_room <= 9
        if max_steps is None:
            max_steps = 8 * room_size**2
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kw)
        self.objs_per_room = objs_per_room
        self.start_carrying = start_carrying

    def gen_mission(self, key, b):
        n = self.objs_per_room
        keys = jax.random.split(key, 5)
        b = RG.place_agent(b, self.layout, keys[0], 0, 0)
        b, kl, cl, pl = RG.add_distractors(b, self.layout, keys[1], 0, 0, n)
        b, kr, cr, pr = RG.add_distractors(b, self.layout, keys[2], 1, 0, n)
        b = RG.remove_wall(b, self.layout, 0, 0, 0)
        ia = jax.random.randint(keys[3], (), 0, n)
        ib = jax.random.randint(jax.random.fold_in(keys[3], 1), (), 0, n)
        swap = jax.random.randint(keys[4], (), 0, 2) == 0
        ka = jnp.where(swap, kr[ib], kl[ia])
        ca = jnp.where(swap, cr[ib], cl[ia])
        pa = jnp.where(swap, pr[ib], pl[ia])
        kb = jnp.where(swap, kl[ia], kr[ib])
        cb = jnp.where(swap, cl[ia], cr[ib])
        self._carry_pos = pa if self.start_carrying else None
        spec = single(leaf(I.PUTNEXT, desc_from_kind_color(ka, ca),
                           desc_from_kind_color(kb, cb)))
        return b, spec, jnp.ones((), bool)

    def _finalize_state(self, state):
        if not self.start_carrying:
            return state
        # teleport obj_a into the agent's hands (putnext.py:193-202)
        pos = self._carry_pos
        cell = state.grid[pos[0], pos[1]]
        grid = G.set_cell(state.grid, pos[0], pos[1],
                          jnp.asarray(C.EMPTY_CELL))
        instr = state.extra["instr"]
        d = instr.descs
        # packed one-hot of the carried object's cell
        here = jnp.where(
            jnp.arange(grid.shape[1]) == pos[1],
            jnp.uint32(1) << jnp.clip(pos[0], 0, 31).astype(jnp.uint32),
            jnp.uint32(0))
        at_pos = jnp.any(d.mask_objs & here[None], axis=1)
        descs = d.replace(
            mask_objs=d.mask_objs & ~here[None],
            carried=d.carried | at_pos,
        )
        extra = {**state.extra, "instr": instr.replace(descs=descs)}
        return state.replace(grid=grid, carrying=cell, extra=extra)


class MoveTwoAcross(RoomGridLevel):
    def __init__(self, room_size, objs_per_room, max_steps=None, **kw):
        assert objs_per_room <= 9
        if max_steps is None:
            max_steps = 16 * room_size**2
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kw)
        self.objs_per_room = objs_per_room

    def gen_mission(self, key, b):
        n = self.objs_per_room
        keys = jax.random.split(key, 5)
        b = RG.place_agent(b, self.layout, keys[0], 0, 0)
        b, kl, cl, _ = RG.add_distractors(b, self.layout, keys[1], 0, 0, n)
        b, kr, cr, _ = RG.add_distractors(b, self.layout, keys[2], 1, 0, n)
        b = RG.remove_wall(b, self.layout, 0, 0, 0)
        pl_ = jax.random.permutation(keys[3], n)[:2]
        pr_ = jax.random.permutation(keys[4], n)[:2]
        a = desc_from_kind_color(kl[pl_[0]], cl[pl_[0]])
        bb = desc_from_kind_color(kr[pr_[0]], cr[pr_[0]])
        c = desc_from_kind_color(kr[pr_[1]], cr[pr_[1]])
        d_ = desc_from_kind_color(kl[pl_[1]], cl[pl_[1]])
        spec = before_instr([leaf(I.PUTNEXT, a, bb)], [leaf(I.PUTNEXT, c, d_)])
        return b, spec, jnp.ones((), bool)


# ---------------------------------------------------------------------------
# Unlock family (unlock.py)
# ---------------------------------------------------------------------------

class Unlock(RoomGridLevel):
    def gen_mission(self, key, b):
        Lt = self.layout
        keys = jax.random.split(key, 8)
        id_ = jax.random.randint(keys[0], (), 0, Lt.num_cols)
        jd = jax.random.randint(keys[1], (), 0, Lt.num_rows)
        b, door_color, _ = RG.add_door(b, Lt, keys[2], id_, jd, None,
                                       locked=True)
        ki, kj = L.sample_room(keys[3], Lt, exclude=(id_, jd))
        b, _, _, _ = RG.add_object(b, Lt, keys[4], ki, kj, kind=0,
                                   color=door_color)
        avoid = jax.random.randint(keys[5], (), 0, 2) == 0
        b = RG.connect_all(b, Lt, keys[6],
                           exclude_color=jnp.where(avoid, door_color.astype(jnp.int32), -1))
        for i in range(Lt.num_cols):
            for j in range(Lt.num_rows):
                k = jax.random.fold_in(keys[7], i * 8 + j)
                nb, _, _, _ = RG.add_distractors(b, Lt, k, i, j, 3,
                                                 all_unique=False)
                skip = (jnp.asarray(i) == id_) & (jnp.asarray(j) == jd)
                b = jax.tree.map(lambda a, c: jnp.where(skip, a, c), b, nb)
        flat = jax.random.categorical(
            jax.random.fold_in(key, 99),
            jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (Lt.num_rows, Lt.num_cols), 1) == id_)
                & (jax.lax.broadcasted_iota(jnp.int32, (Lt.num_rows, Lt.num_cols), 0) == jd),
                -1e9, 0.0).reshape(-1))
        b = RG.place_agent(b, Lt, jax.random.fold_in(key, 98),
                           flat % Lt.num_cols, flat // Lt.num_cols)
        ok = L.check_objs_reachable(b)
        return b, single(leaf(I.OPEN, desc(DOOR_T, door_color))), ok


class UnlockLocal(RoomGridLevel):
    def __init__(self, distractors=False, **kw):
        super().__init__(**kw)
        self.distractors = distractors

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        b, door_color, _ = RG.add_door(b, self.layout, keys[0], 1, 1, None,
                                       locked=True)
        b, _, _, _ = RG.add_object(b, self.layout, keys[1], 1, 1, kind=0,
                                   color=door_color)
        if self.distractors:
            b, _, _, _ = RG.add_distractors(b, self.layout, keys[2], 1, 1, 3)
        b = RG.place_agent(b, self.layout, keys[3], 1, 1)
        return b, single(leaf(I.OPEN, desc(DOOR_T))), jnp.ones((), bool)


class KeyInBox(RoomGridLevel):
    def gen_mission(self, key, b):
        keys = jax.random.split(key, 4)
        b, door_color, _ = RG.add_door(b, self.layout, keys[0], 1, 1, None,
                                       locked=True)
        box_color = RG._sorted_color(jax.random.randint(keys[1], (), 0, 6))
        box = pack_cell(C.BOX, box_color, 0, C.KEY, door_color)
        b, _ = RG.place_in_room(b, self.layout, keys[2], 1, 1, box)
        b = RG.place_agent(b, self.layout, keys[3], 1, 1)
        return b, single(leaf(I.OPEN, desc(DOOR_T))), jnp.ones((), bool)


class UnlockPickup(RoomGridLevel):
    def __init__(self, distractors=False, max_steps=None, **kw):
        room_size = 6
        if max_steps is None:
            max_steps = 8 * room_size**2
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kw)
        self.distractors = distractors

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 5)
        b, _, box_color, _ = RG.add_object(b, self.layout, keys[0], 1, 0, kind=2)
        b, door_color, _ = RG.add_door(b, self.layout, keys[1], 0, 0, 0,
                                       locked=True)
        b, _, _, _ = RG.add_object(b, self.layout, keys[2], 0, 0, kind=0,
                                   color=door_color)
        if self.distractors:
            b, _, _, _ = RG.add_distractors(b, self.layout, keys[3],
                                            num_distractors=4)
        b = RG.place_agent(b, self.layout, keys[4], 0, 0)
        return b, single(leaf(I.PICKUP, desc(BOX_T, box_color))), \
            jnp.ones((), bool)


class BlockedUnlockPickup(RoomGridLevel):
    def __init__(self, max_steps=None, **kw):
        room_size = 6
        if max_steps is None:
            max_steps = 16 * room_size**2
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 5)
        b, _, _, _ = RG.add_object(b, self.layout, keys[0], 1, 0, kind=2)
        b, door_color, pos = RG.add_door(b, self.layout, keys[1], 0, 0, 0,
                                         locked=True)
        ball_color = RG._sorted_color(jax.random.randint(keys[2], (), 0, 6))
        b = b.replace(grid=G.set_cell(b.grid, pos[0] - 1, pos[1],
                                      pack_cell(C.BALL, ball_color)))
        b, _, _, _ = RG.add_object(b, self.layout, keys[3], 0, 0, kind=0,
                                   color=door_color)
        b = RG.place_agent(b, self.layout, keys[4], 0, 0)
        return b, single(leaf(I.PICKUP, desc(BOX_T))), jnp.ones((), bool)


class UnlockToUnlock(RoomGridLevel):
    def __init__(self, max_steps=None, **kw):
        room_size = 6
        if max_steps is None:
            max_steps = 30 * room_size**2
        super().__init__(num_rows=1, num_cols=3, room_size=room_size,
                         max_steps=max_steps, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 7)
        colors = RG._sorted_color(jax.random.permutation(keys[0], 6)[:2])
        b, _, _ = RG.add_door(b, self.layout, keys[1], 0, 0, 0,
                              color=colors[0], locked=True)
        b, _, _, _ = RG.add_object(b, self.layout, keys[2], 2, 0, kind=0,
                                   color=colors[0])
        b, _, _ = RG.add_door(b, self.layout, keys[3], 1, 0, 0,
                              color=colors[1], locked=True)
        b, _, _, _ = RG.add_object(b, self.layout, keys[4], 1, 0, kind=0,
                                   color=colors[1])
        b, _, _, _ = RG.add_object(b, self.layout, keys[5], 0, 0, kind=1)
        b = RG.place_agent(b, self.layout, keys[6], 1, 0)
        return b, single(leaf(I.PICKUP, desc(BALL_T))), jnp.ones((), bool)


# ---------------------------------------------------------------------------
# Other (other.py)
# ---------------------------------------------------------------------------

class ActionObjDoor(RoomGridLevel):
    def __init__(self, **kw):
        super().__init__(room_size=7, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 9)
        b, kinds, colors, _ = RG.add_distractors(b, self.layout, keys[0],
                                                 1, 1, 5)
        door_colors = []
        for n in range(4):
            b, dc, _ = RG.add_door(b, self.layout, keys[1 + n], 1, 1, None,
                                   locked=False)
            door_colors.append(dc)
        b = RG.place_agent(b, self.layout, keys[5], 1, 1)
        types = jnp.asarray(
            [jnp.select([kinds[i] == 0, kinds[i] == 1], [KEY_T, BALL_T],
                        default=BOX_T) for i in range(5)])
        all_types = jnp.concatenate([types, jnp.full(4, DOOR_T)])
        all_colors = jnp.concatenate(
            [colors.astype(jnp.int32), jnp.stack(door_colors).astype(jnp.int32)])
        pick = jax.random.randint(keys[6], (), 0, 9)
        t, c = all_types[pick], all_colors[pick]
        coin = jax.random.randint(keys[7], (), 0, 2) == 0
        kind = jnp.where(
            t == DOOR_T, jnp.where(coin, I.GOTO, I.OPEN),
            jnp.where(coin, I.GOTO, I.PICKUP)).astype(jnp.int32)
        return b, single(leaf(kind, desc(t, c))), jnp.ones((), bool)


class FindObjS5(RoomGridLevel):
    def __init__(self, room_size=5, max_steps=None, **kw):
        if max_steps is None:
            max_steps = 20 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 5)
        i = jax.random.randint(keys[0], (), 0, self.layout.num_cols)
        j = jax.random.randint(keys[1], (), 0, self.layout.num_rows)
        b, kind, _, _ = RG.add_object(b, self.layout, keys[2], i, j)
        b = RG.place_agent(b, self.layout, keys[3], 1, 1)
        b = RG.connect_all(b, self.layout, keys[4])
        d = desc_from_kind_color(kind, 0)
        return b, single(leaf(I.PICKUP, (d[0], jnp.asarray(I.COLOR_NONE, jnp.int32),
                                         d[2]))), jnp.ones((), bool)


class KeyCorridor(RoomGridLevel):
    def __init__(self, num_rows=3, obj_type="ball", room_size=6,
                 max_steps=None, **kw):
        if max_steps is None:
            max_steps = 30 * room_size**2
        super().__init__(room_size=room_size, num_rows=num_rows,
                         max_steps=max_steps, **kw)
        self.obj_type = obj_type

    def gen_mission(self, key, b):
        Lt = self.layout
        keys = jax.random.split(key, 7)
        for j in range(1, Lt.num_rows):
            b = RG.remove_wall(b, Lt, 1, j, 3)
        room_j = jax.random.randint(keys[0], (), 0, Lt.num_rows)
        b, door_color, _ = RG.add_door(b, Lt, keys[1], 2, room_j, 2,
                                       locked=True)
        kind = {"key": 0, "ball": 1, "box": 2}[self.obj_type]
        b, _, _, _ = RG.add_object(b, Lt, keys[2], 2, room_j, kind=kind)
        key_j = jax.random.randint(keys[3], (), 0, Lt.num_rows)
        b, _, _, _ = RG.add_object(b, Lt, keys[4], 0, key_j, kind=0,
                                   color=door_color)
        b = RG.place_agent(b, Lt, keys[5], 1, Lt.num_rows // 2)
        b = RG.connect_all(b, Lt, keys[6])
        t = {"key": KEY_T, "ball": BALL_T, "box": BOX_T}[self.obj_type]
        return b, single(leaf(I.PICKUP, desc(t))), jnp.ones((), bool)


class OneRoomS8(RoomGridLevel):
    def __init__(self, room_size=8, **kw):
        super().__init__(room_size=room_size, num_rows=1, num_cols=1, **kw)

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 2)
        b, _, _, _ = RG.add_object(b, self.layout, keys[0], 0, 0, kind=1)
        b = RG.place_agent(b, self.layout, keys[1], 0, 0)
        return b, single(leaf(I.PICKUP, desc(BALL_T))), jnp.ones((), bool)


# ---------------------------------------------------------------------------
# Synth (synth.py) — thin LevelGen configs
# ---------------------------------------------------------------------------

class Synth(LevelGen):
    def __init__(self, room_size=8, num_rows=3, num_cols=3, num_dists=18, **kw):
        super().__init__(room_size=room_size, num_rows=num_rows,
                         num_cols=num_cols, num_dists=num_dists,
                         instr_kinds=["action"], locations=False,
                         unblocking=True, implicit_unlock=False, **kw)


class SynthLoc(LevelGen):
    def __init__(self, **kw):
        super().__init__(instr_kinds=["action"], locations=True,
                         unblocking=True, implicit_unlock=False, **kw)


class SynthSeq(LevelGen):
    def __init__(self, **kw):
        super().__init__(locations=True, unblocking=True,
                         implicit_unlock=False, **kw)


class MiniBossLevel(LevelGen):
    def __init__(self, **kw):
        super().__init__(num_cols=2, num_rows=2, room_size=5, num_dists=7,
                         locked_room_prob=0.25, **kw)


class BossLevel(LevelGen):
    def __init__(self, **kw):
        super().__init__(**kw)


class BossLevelNoUnlock(LevelGen):
    def __init__(self, **kw):
        super().__init__(locked_room_prob=0, implicit_unlock=False, **kw)


# ---------------------------------------------------------------------------
# Structured six-section documentation for every level class (the reference
# BabyAI env files carry the same sections, e.g.
# /root/reference/minigrid/envs/babyai/goto.py:13-60), composed with the
# shared envdoc helper and rendered by docs/gen_env_docs.py.
# ---------------------------------------------------------------------------
from minigrid_tpu.envs.envdoc import env_doc as _env_doc  # noqa: E402

_GRAMMAR = ("Any sentence the Baby Language grammar can produce: go-to / "
            "pick-up / open / put-next clauses, optionally described by "
            "location, joined by and/then/after connectives.")

_LEVEL_DOCS = {
    "GoToRedBallGrey": (
        "Walk to the red ball in a single room. Distractors are present "
        "but all grey, minimizing perceptual load; language is not needed.",
        '"go to the red ball"', "The agent reaches the red ball."),
    "GoToRedBall": (
        "Walk to the red ball in a single room with colored distractors; "
        "language is still unnecessary.",
        '"go to the red ball"', "The agent reaches the red ball."),
    "GoToRedBallNoDists": (
        "Walk to the red ball in an otherwise empty room (no distractors).",
        '"go to the red ball"', "The agent reaches the red ball."),
    "GoToObj": (
        "Walk to the named object in a single doorless room without "
        "distractors. `GoToObjS{X}` ids set room size X.",
        '"go to the {color} {type}"', "The agent reaches the object."),
    "GoToLocal": (
        "Walk to the named object in a single doorless room among "
        "distractors. `GoToLocalS{X}N{Y}` ids set room size X and "
        "distractor count Y.",
        '"go to the {color} {type}"', "The agent reaches the object."),
    "GoTo": (
        "Walk to the named object, possibly in another room of the maze, "
        "among many distractors.",
        '"go to a/the {color} {type}"', "The agent reaches the object."),
    "GoToImpUnlock": (
        "Walk to an object that may sit in a locked room: the agent must "
        "infer it needs a key (implicit unlocking). No blocked paths. "
        "Competencies: Maze, GoTo, ImpUnlock.",
        '"go to a/the {color} {type}"', "The agent reaches the object."),
    "GoToSeq": (
        "A sequence of go-to commands joined by and/then connectives. No "
        "locked rooms, locations or unblocking. Competencies: Maze, GoTo, "
        "Seq.",
        '"go to a/the {color} {type}" (possibly chained with '
        '"and ..."/", then ...")', "The agent completes the sequence."),
    "GoToRedBlueBall": (
        "Walk to the unique red or blue ball (the mission says which); "
        "distractors are never red or blue balls, so language is optional.",
        '"go to the {color} ball"', "The agent reaches the ball."),
    "GoToDoorLevel": (
        "Walk next to the door of the named color in the current room; no "
        "distractors.",
        '"go to the {color} door"', "The agent reaches the door."),
    "GoToObjDoor": (
        "Walk next to the named object or door in the current room.",
        '"go to the {color} {type}"',
        "The agent reaches the object or door."),
    "Open": (
        "Open a door of the named color, possibly in another room.",
        '"open a {color} door"', "The agent opens the door."),
    "OpenRedDoor": (
        "Open the red door in the current room (always unlocked). A "
        "deliberately minimal debugging level.",
        '"open the red door"', "The agent opens the red door."),
    "OpenDoor": (
        "Open the door identified by color or by location in the current "
        "room (always unlocked).",
        '"open the {color} door"', "The agent opens the requested door."),
    "OpenTwoDoors": (
        "Open the first-named door and then the second; the doors face "
        "opposite directions so the first door's state leaves the view — "
        "solving reliably needs memory.",
        '"open the {color} door, then open the {color} door"',
        "The agent opens the second door after the first."),
    "OpenDoorsOrder": (
        "Open one or two doors in the prescribed order (before/after "
        "connectives).",
        '"open the {color} door" / two-door order variants',
        "The agent opens the doors in the required order."),
    "Pickup": (
        "Pick up the named object, possibly in another room.",
        '"pick up a {color} {type}"', "The agent picks up the object."),
    "UnblockPickup": (
        "Pick up the named object, possibly in another room, where the "
        "route may be blocked by objects that must be moved aside.",
        '"pick up a/the {color} {type}"',
        "The agent picks up the object."),
    "PickupLoc": (
        "Pick up an object that may be described by its location (e.g. "
        "behind you, on your left) in a single room. Competencies: "
        "PickUp, Loc.",
        '"pick up the {color} {type} {location}"',
        "The agent picks up the object."),
    "PickupDist": (
        "Pick up the object described by type, color, or both, in one "
        "room full of distractors.",
        '"pick up a/the {color}/{type}/{color} {type}"',
        "The agent picks up the object."),
    "PickupAbove": (
        "Pick up the named object in the room above the agent's start "
        "room — effectively a compass-use task.",
        '"go to the {color} {type}"', "The agent picks up the object."),
    "PutNextLocal": (
        "Pick up one named object and drop it next to another, in a "
        "single doorless room.",
        '"put the {color} {type} next to the {color} {type}"',
        "The mover object rests next to the target object."),
    "PutNext": (
        "Move object A next to object B across a multi-room maze.",
        '"put the {color} {type} next to the {color} {type}"',
        "The mover object rests next to the target object."),
    "MoveTwoAcross": (
        "Move A next to B and C next to D — a compositional task with a "
        "very large instruction space.",
        '"put the {color} {type} next to the {color} {type}, then put '
        'the {color} {type} next to the {color} {type}"',
        "Both pairs are adjacent in the required order."),
    "Unlock": (
        "Find the key and unlock the door of the named color somewhere in "
        "the maze. Competencies: Maze, Open, Unlock.",
        '"open the {color} door"', "The agent opens the locked door."),
    "UnlockLocal": (
        "Fetch the key lying in the current room and unlock its door.",
        '"open the door"', "The agent opens the door."),
    "KeyInBox": (
        "Unlock the door; the key is hidden inside a box in the current "
        "room.",
        '"open the door"', "The agent opens the door."),
    "UnlockPickup": (
        "Unlock the connecting door, then pick up the named box in the "
        "far room.",
        '"pick up the {color} box"', "The agent picks up the box."),
    "BlockedUnlockPickup": (
        "Unlock a door whose doorway is blocked by a ball, then pick up "
        "the box in the far room.",
        '"pick up the box"', "The agent picks up the box."),
    "UnlockToUnlock": (
        "Unlock door A whose key sits behind locked door B: two chained "
        "unlocks, then pick up the ball.",
        '"pick up the ball"', "The agent picks up the ball."),
    "ActionObjDoor": (
        "One of: pick up an object, go to an object or door, or open a "
        "door — all within the current room.",
        '"pick up the {color} {type}" / "go to the {color} {type}" / '
        '"open a {color} door"', "The agent completes the instruction."),
    "FindObjS5": (
        "Pick up the object hidden in some room of the 3x3 maze (size-5 "
        "rooms): potentially exhaustive exploration.",
        '"pick up the {type}"', "The agent picks up the object."),
    "KeyCorridor": (
        "A ball waits behind a locked door off a corridor; the key lies "
        "in another room. Mission text gives no hints.",
        '"pick up the ball"', "The agent picks up the ball."),
    "OneRoomS8": (
        "Pick up the ball in a single size-8 room.",
        '"pick up the ball"', "The agent picks up the ball."),
    "Synth": (
        "One instruction drawn from the union of PutNext / Open / GoTo / "
        "PickUp forms; may require moving objects and explicit unlocking. "
        "Competencies: Maze, Unblock, Unlock, GoTo, PickUp, PutNext, "
        "Open.",
        '"go to ..." / "pick up ..." / "open ..." / "put ... next to ..."',
        "The agent achieves the instructed task."),
    "SynthLoc": (
        "Synth with location-describing language (PickupLoc-style) mixed "
        "into object descriptions; no implicit unlocking.",
        'Synth forms, with optional "{location}" descriptors',
        "The agent achieves the instructed task."),
    "SynthSeq": (
        "SynthLoc instructions chained into sequences with and/then/after "
        "connectives; no implicit unlocking.",
        _GRAMMAR, "The agent achieves the instructed sequence."),
    "MiniBossLevel": (
        "The full Baby Language grammar over a smaller maze with a lower "
        "locked-room probability — a cheaper BossLevel.",
        _GRAMMAR, "The agent achieves the instructed task."),
    "BossLevel": (
        "Any sentence the full Baby Language grammar can produce; the "
        "union of every competency and a superset of every other level.",
        _GRAMMAR, "The agent achieves the instructed task."),
    "BossLevelNoUnlock": (
        "BossLevel without implicit unlocking: locked rooms never hide "
        "mission targets.",
        _GRAMMAR, "The agent achieves the instructed task."),
}

for _name, (_d, _m, _t) in _LEVEL_DOCS.items():
    globals()[_name].__doc__ = _env_doc(
        _d, _m, used=(0, 1, 2, 3, 4, 5),
        termination=(_t, "Timeout (dynamic `max_steps`, scaled to the "
                         "instruction's demands)."))
del _name, _d, _m, _t

"""Combinatorial BabyAI mission generator (reference
minigrid/envs/babyai/core/levelgen.py:25-211)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import roomgrid as RG
from minigrid_tpu.envs.babyai.core import instrs as I
from minigrid_tpu.envs.babyai.core import level as L

ALL_TYPES = (0, 1, 2, 3)       # box, ball, key, door (I.OBJ_TYPES order)
NOT_DOOR = (0, 1, 2)
DOOR_ONLY = (3,)


def add_locked_room(b, layout, key):
    """Lock one random interior door and hide its key elsewhere
    (levelgen.py:86-113). Returns (builder, locked_room (i, j))."""

    def cond(carry):
        b, li, lj, placed, n = carry
        return ~placed & (n < 100)

    def body(carry):
        b, li, lj, placed, n = carry
        k = jax.random.fold_in(key, n)
        k_i, k_j, k_d, k_door = jax.random.split(k, 4)
        i = jax.random.randint(k_i, (), 0, layout.num_cols)
        j = jax.random.randint(k_j, (), 0, layout.num_rows)
        d = jax.random.randint(k_d, (), 0, 4)
        ok = RG.has_neighbor(layout, i, j, d)
        nb, color, pos = RG.add_door(b, layout, k_door, i, j, d, locked=True)
        b = jax.tree.map(lambda a, c: jnp.where(ok, c, a), b, nb)
        return b, jnp.where(ok, i, li), jnp.where(ok, j, lj), placed | ok, n + 1

    z = jnp.zeros((), jnp.int32)
    b, li, lj, _, _ = jax.lax.while_loop(
        cond, body, (b, z, z, jnp.zeros((), bool), z))

    # retrieve the door color: the locked door is unique at this point
    locked = (b.grid[..., 0] == C.DOOR) & (b.grid[..., 2] == C.LOCKED)
    flat = jnp.argmax(locked.reshape(-1))
    door_color = b.grid.reshape(-1, 5)[flat, 1]

    # key in any other room (levelgen.py:102-112)
    k_room, k_place = jax.random.split(jax.random.fold_in(key, 777))
    ki, kj = L.sample_room(k_room, layout, exclude=(li, lj))
    b, _, _, _ = RG.add_object(b, layout, k_place, ki, kj, kind=0,
                               color=door_color)
    return b, (li, lj)


def rand_obj(b, layout, key, types=ALL_TYPES, locations=True,
             implicit_unlock=True, locked_rect=None, max_tries=100):
    """Random descriptor matching >=1 object (levelgen.py:115-156).
    Returns ((type, color, loc), ok)."""
    type_table = jnp.asarray(types, jnp.int32)
    ri, rj = layout.room_from_pos(b.agent_pos)
    room_rect = layout.room_rect_mask(ri, rj)

    def draw(k):
        k_c, k_t, k_lb, k_l = jax.random.split(k, 4)
        # color: _rand_elem([None, *colors]) — 7 options (levelgen.py:130)
        c = jax.random.randint(k_c, (), 0, 7)
        color = jnp.where(c == 0, I.COLOR_NONE, c - 1)
        # sorted-name order for real colors
        color = jnp.where(
            c == 0, I.COLOR_NONE,
            jnp.asarray([C.COLOR_TO_IDX[n] for n in C.COLOR_NAMES],
                        jnp.int32)[jnp.clip(c - 1, 0, 5)])
        t = type_table[jax.random.randint(k_t, (), 0, len(types))]
        if locations:
            use_loc = jax.random.randint(k_lb, (), 0, 2) == 0
            loc = jnp.where(use_loc, jax.random.randint(k_l, (), 0, 4),
                            I.LOC_NONE)
        else:
            loc = jnp.asarray(I.LOC_NONE, jnp.int32)
        mask = I.match_mask(b.grid, b.agent_pos, b.agent_dir, room_rect,
                            t, color, loc)
        ok = mask.any()
        if not implicit_unlock and locked_rect is not None:
            ok &= (mask & ~locked_rect).any()
        return (t, color, loc), ok

    def cond(carry):
        _, ok, n = carry
        return ~ok & (n < max_tries)

    def body(carry):
        vals, _, n = carry
        new_vals, ok = draw(jax.random.fold_in(key, n + 1))
        vals = jax.tree.map(lambda a, c: jnp.where(ok, c, a), vals, new_vals)
        return vals, ok, n + 1

    vals0, ok0 = draw(jax.random.fold_in(key, 0))
    vals, ok, _ = jax.lax.while_loop(
        cond, body, (vals0, ok0, jnp.zeros((), jnp.int32)))
    return vals, ok


class LevelGen(L.RoomGridLevel):
    """Every-possible-sentence generator (levelgen.py:25-211)."""

    def __init__(self, room_size=8, num_rows=3, num_cols=3, num_dists=18,
                 locked_room_prob=0.5, locations=True, unblocking=True,
                 implicit_unlock=True,
                 action_kinds=("goto", "pickup", "open", "putnext"),
                 instr_kinds=("action", "and", "seq"), **kw):
        super().__init__(room_size=room_size, num_rows=num_rows,
                         num_cols=num_cols, **kw)
        self.num_dists = num_dists
        self.locked_room_prob = locked_room_prob
        self.locations = locations
        self.unblocking = unblocking
        self.implicit_unlock = implicit_unlock
        self.action_kinds = action_kinds
        self.instr_kinds = instr_kinds

    def _rand_action_leaf(self, b, key, ok):
        """One random action instruction (levelgen.py:160-177)."""
        k_a, k_o1, k_o2 = jax.random.split(key, 3)
        a = jax.random.randint(k_a, (), 0, len(self.action_kinds))
        kind_map = {"goto": I.GOTO, "pickup": I.PICKUP, "open": I.OPEN,
                    "putnext": I.PUTNEXT}
        kinds = jnp.asarray([kind_map[k] for k in self.action_kinds])
        kind = kinds[a]

        lr = getattr(self, "_locked_rect", None)

        def obj(k, types):
            nonlocal ok
            d, o = rand_obj(b, self.layout, k, types=types,
                            locations=self.locations,
                            implicit_unlock=self.implicit_unlock,
                            locked_rect=lr)
            ok = ok & o
            return d

        d_all = obj(k_o1, ALL_TYPES)
        d_nd = obj(jax.random.fold_in(k_o1, 1), NOT_DOOR)
        d_door = obj(jax.random.fold_in(k_o1, 2), DOOR_ONLY)
        d_fixed = obj(k_o2, ALL_TYPES)

        # select the move descriptor by action kind
        def pick(field):
            return jnp.select(
                [kind == I.GOTO, kind == I.PICKUP, kind == I.OPEN],
                [d_all[field], d_nd[field], d_door[field]],
                default=d_nd[field])

        d_move = (pick(0), pick(1), pick(2))
        is_put = kind == I.PUTNEXT
        fixed = tuple(
            jnp.where(is_put, d_fixed[n],
                      jnp.asarray(L.NONE_DESC[n], jnp.int32))
            for n in range(3))
        return L.leaf(kind, d_move, fixed), ok

    def gen_mission(self, key, b):
        keys = jax.random.split(key, 12)
        L_ = self.layout
        ok = jnp.ones((), bool)

        # optional locked room (levelgen.py:60-61)
        use_locked = jax.random.uniform(keys[0]) < self.locked_room_prob
        has_locked_branch = self.locked_room_prob > 0
        if has_locked_branch:
            nb, (li, lj) = add_locked_room(b, L_, keys[1])
            b = jax.tree.map(lambda a, c: jnp.where(use_locked, c, a), b, nb)
            li = jnp.where(use_locked, li, -1)
            lj = jnp.where(use_locked, lj, -1)
            locked_rect = jnp.where(
                use_locked, L_.room_rect_mask(jnp.maximum(li, 0),
                                              jnp.maximum(lj, 0)),
                jnp.zeros((L_.width, L_.height), bool))
        else:
            li = lj = jnp.asarray(-1)
            locked_rect = jnp.zeros((L_.width, L_.height), bool)
        self._locked_rect = locked_rect

        b = RG.connect_all(b, L_, keys[2])
        b, _, _, _ = RG.add_distractors(b, L_, keys[3],
                                        num_distractors=self.num_dists,
                                        all_unique=False)

        # agent placement outside the locked room (levelgen.py:67-75)
        # one-hot blend, not a bool scatter (grid.py onehot_set rationale)
        locked_room = (
            (jnp.arange(L_.num_rows)[:, None]
             == jnp.clip(lj, 0, L_.num_rows - 1))
            & (jnp.arange(L_.num_cols) == jnp.clip(li, 0, L_.num_cols - 1))
            & (li >= 0))
        valid_rooms = ~locked_room
        flat = jax.random.categorical(
            keys[4], jnp.where(valid_rooms.reshape(-1), 0.0, -1e9))
        ai = flat % L_.num_cols
        aj = flat // L_.num_cols
        b = RG.place_agent(b, L_, keys[5], ai, aj)

        if not self.unblocking:
            ok &= L.check_objs_reachable(b)

        # instruction structure (levelgen.py:158-211)
        ik = jax.random.randint(keys[6], (), 0, len(self.instr_kinds))
        kind_names = list(self.instr_kinds)
        is_action = jnp.asarray(
            [n == "action" for n in kind_names])[ik]
        is_and = jnp.asarray([n == "and" for n in kind_names])[ik]

        l0, ok = self._rand_action_leaf(b, keys[7], ok)
        l1, ok = self._rand_action_leaf(b, keys[8], ok)
        l2, ok = self._rand_action_leaf(b, keys[9], ok)
        l3, ok = self._rand_action_leaf(b, keys[10], ok)

        # seq parts: action or and (levelgen.py:181-196)
        ka, kb, kba = jax.random.split(keys[11], 3)
        a_and = jax.random.randint(ka, (), 0, 2) == 0
        b_and = jax.random.randint(kb, (), 0, 2) == 0
        before = jax.random.randint(kba, (), 0, 2) == 0

        root = jnp.where(
            is_action, I.ROOT_ACTION,
            jnp.where(is_and, I.ROOT_AND,
                      jnp.where(before, I.ROOT_BEFORE, I.ROOT_AFTER)))
        a_is_and = ~is_action & (is_and | a_and)
        b_is_and = ~is_action & ~is_and & b_and

        # deactivate unused leaves
        def gate(lf, active):
            return {**lf, "kind": jnp.where(active, lf["kind"], I.UNUSED)}

        use1 = a_is_and
        use2 = ~is_action & ~is_and
        use3 = b_is_and
        spec = {
            "root": root, "a_and": a_is_and, "b_and": b_is_and,
            "leaves": [l0, gate(l1, use1), gate(l2, use2), gate(l3, use3)],
        }
        del self._locked_rect
        return b, spec, ok

"""BabyAI level base: mission generation loop, validation, dynamic budget.

Re-design of the reference ``RoomGridLevel``
(``minigrid/envs/babyai/core/roomgrid_level.py:19-302``): the unbounded
{generate → validate → retry} rejection loop (:119-140) becomes a bounded
``lax.while_loop`` whose body regenerates the whole level from a fresh key;
``validate_instrs`` (:146-199) and ``check_objs_reachable`` (:250-302) are
array predicates; the per-episode step budget ``num_navs * room_size^2 *
rows * cols`` (:71-85) lives in ``state.extra`` since it is data-dependent.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import roomgrid as RG
from minigrid_tpu.core.obs import gen_obs
from minigrid_tpu.core.step import step_core
from minigrid_tpu.envs.babyai.core import instrs as I
from minigrid_tpu.envs.roomgrid_base import RoomGridEnv

# BABYAI_DONE_ACTIONS switches to explicit-done verification
# (verifier.py:24-26); read statically at import like the reference.
USE_DONE_ACTIONS = bool(os.environ.get("BABYAI_DONE_ACTIONS", False))


# ---------------------------------------------------------------------------
# Instruction spec assembly (host-side structure, traced contents)
# ---------------------------------------------------------------------------

def desc(type_idx, color=I.COLOR_NONE, loc=I.LOC_NONE):
    """Descriptor spec triple. ``type_idx`` indexes I.OBJ_TYPES, 4 = None."""
    return (jnp.asarray(type_idx, jnp.int32), jnp.asarray(color, jnp.int32),
            jnp.asarray(loc, jnp.int32))


NONE_DESC = (I.TYPE_NONE, I.COLOR_NONE, I.LOC_NONE)


def desc_from_kind_color(kind, color):
    """Descriptor from an ``add_object``/distractor (kind, color) pair;
    kind indexes roomgrid.KIND_IDS [key, ball, box] -> OBJ_TYPES index."""
    type_idx = jnp.select(
        [jnp.asarray(kind) == 0, jnp.asarray(kind) == 1],
        [jnp.asarray(2), jnp.asarray(1)], default=jnp.asarray(0))
    return desc(type_idx, jnp.asarray(color, jnp.int32))


def leaf(kind, d_move, d_fixed=None, strict=False):
    return {
        "kind": jnp.asarray(kind, jnp.int32),
        "strict": jnp.asarray(strict, bool),
        "move": d_move,
        "fixed": NONE_DESC if d_fixed is None else d_fixed,
    }


UNUSED_LEAF = leaf(I.UNUSED, NONE_DESC)


def single(l0):
    return {"root": jnp.asarray(I.ROOT_ACTION, jnp.int32),
            "a_and": jnp.asarray(False), "b_and": jnp.asarray(False),
            "leaves": [l0, UNUSED_LEAF, UNUSED_LEAF, UNUSED_LEAF]}


def and_instr(l0, l1):
    return {"root": jnp.asarray(I.ROOT_AND, jnp.int32),
            "a_and": jnp.asarray(True), "b_and": jnp.asarray(False),
            "leaves": [l0, l1, UNUSED_LEAF, UNUSED_LEAF]}


def seq_instr(root_kind, part_a, part_b):
    """part_a / part_b are lists of 1 or 2 leaves."""
    a = list(part_a) + [UNUSED_LEAF] * (2 - len(part_a))
    b = list(part_b) + [UNUSED_LEAF] * (2 - len(part_b))
    return {"root": jnp.asarray(root_kind, jnp.int32),
            "a_and": jnp.asarray(len(part_a) == 2),
            "b_and": jnp.asarray(len(part_b) == 2),
            "leaves": a + b}


def before_instr(part_a, part_b):
    return seq_instr(I.ROOT_BEFORE, part_a, part_b)


def after_instr(part_a, part_b):
    return seq_instr(I.ROOT_AFTER, part_a, part_b)


# ---------------------------------------------------------------------------
# Builder helpers specific to BabyAI
# ---------------------------------------------------------------------------

def check_objs_reachable(b: RG.Builder) -> jax.Array:
    """True iff every object is reachable without moving others
    (roomgrid_level.py:250-302)."""
    t = b.grid[..., 0]
    passable = (t == C.EMPTY) | (t == C.DOOR)
    W, H = t.shape
    reach = ((jnp.arange(W)[:, None] == b.agent_pos[0])
             & (jnp.arange(H) == b.agent_pos[1]))

    def body(_, reach):
        exp = reach & passable
        grow = (
            jnp.pad(exp[:-1, :], ((1, 0), (0, 0)))
            | jnp.pad(exp[1:, :], ((0, 1), (0, 0)))
            | jnp.pad(exp[:, :-1], ((0, 0), (1, 0)))
            | jnp.pad(exp[:, 1:], ((0, 0), (0, 1)))
        )
        return reach | grow

    reach = jax.lax.fori_loop(0, W * H, body, reach)
    must_reach = (t != C.EMPTY) & (t != C.WALL)
    return (must_reach <= reach).all()


def open_all_doors(b: RG.Builder) -> RG.Builder:
    """Set every door open (roomgrid_level.py:238-248)."""
    is_door = b.grid[..., 0] == C.DOOR
    state = jnp.where(is_door, jnp.zeros((), jnp.uint8), b.grid[..., 2])
    return b.replace(grid=b.grid.at[..., 2].set(state))


def locked_door_colors(b: RG.Builder) -> jax.Array:
    """(6,) bool — colors of locked doors present in the grid."""
    locked = (b.grid[..., 0] == C.DOOR) & (b.grid[..., 2] == C.LOCKED)
    colors = b.grid[..., 1].astype(jnp.int32)
    # dense membership, not a bool scatter (grid.py onehot_set rationale)
    return ((colors[..., None] == jnp.arange(6))
            & locked[..., None]).any((0, 1))


def sample_room(key, layout, exclude=None):
    """Uniform room (i, j), optionally excluding one room."""
    R, Cc = layout.num_rows, layout.num_cols
    logits = jnp.zeros((R, Cc))
    if exclude is not None:
        ei, ej = exclude
        logits = logits.at[ej, ei].set(-1e9)
    flat = jax.random.categorical(key, logits.reshape(-1))
    return flat % Cc, flat // Cc


# ---------------------------------------------------------------------------
# The level base class
# ---------------------------------------------------------------------------

class RoomGridLevel(RoomGridEnv):
    unblocking: bool = False
    max_gen_attempts: int = 64

    def __init__(self, room_size=8, num_rows=3, num_cols=3, max_steps=None,
                 **kw):
        self.fixed_max_steps = max_steps is not None
        super().__init__(room_size=room_size, num_rows=num_rows,
                         num_cols=num_cols,
                         max_steps=max_steps if max_steps else (1 << 30), **kw)

    def default_mission(self) -> str:
        return "go"

    def mission_space(self):
        """Catch-all (reference BabyAIMissionSpace,
        roomgrid_level.py:27-43): instructions come from the combinatorial
        grammar, not enumerable placeholders."""
        from minigrid_tpu.core.mission_space import BabyAIMissionSpace

        return BabyAIMissionSpace()

    # Subclasses: (builder, spec, ok) = gen_mission(key, builder)
    def gen_mission(self, key, b: RG.Builder):
        raise NotImplementedError

    def _finalize_state(self, state):
        """Post-generation adjustment hook (e.g. PutNext start_carrying,
        putnext.py:193-202)."""
        return state

    def _instr_from_spec(self, spec, b: RG.Builder) -> I.InstrState:
        p = self.params
        instr = I.empty_instr(p.width, p.height)
        instr = instr.replace(
            root_kind=spec["root"], a_is_and=spec["a_and"],
            b_is_and=spec["b_and"],
            kinds=jnp.stack([lf["kind"] for lf in spec["leaves"]]),
            strict=jnp.stack([lf["strict"] for lf in spec["leaves"]]),
        )
        ri, rj = self.layout.room_from_pos(b.agent_pos)
        room_rect = self.layout.room_rect_mask(ri, rj)
        descs = instr.descs
        for i, lf in enumerate(spec["leaves"]):
            for j, dd in enumerate((lf["move"], lf["fixed"])):
                descs = I.init_desc_slot(
                    descs, 2 * i + j, b.grid, b.agent_pos, b.agent_dir,
                    room_rect, dd[0], dd[1], dd[2])
        return instr.replace(descs=descs)

    def _validate(self, b: RG.Builder, instr: I.InstrState) -> jax.Array:
        """validate_instrs (roomgrid_level.py:146-199)."""
        ok = jnp.ones((), bool)
        locked_colors = locked_door_colors(b)
        for i in range(4):
            active = instr.kinds[i] != I.UNUSED
            is_put = instr.kinds[i] == I.PUTNEXT
            move = instr.descs.mask_objs[2 * i]       # (H,) packed rows
            fixed = instr.descs.mask_objs[2 * i + 1]
            overlap = (move & fixed).any()
            # objs already next to each other? packed 4-neighborhood:
            # x+-1 are bit shifts, y+-1 are row shifts
            z = jnp.zeros((1,), jnp.uint32)
            near = ((fixed << 1) | (fixed >> 1)
                    | jnp.concatenate([fixed[1:], z])
                    | jnp.concatenate([z, fixed[:-1]]))
            touching = (move & near).any()
            ok &= ~(active & is_put & (overlap | touching))

            if self.unblocking:
                for slot in (2 * i, 2 * i + 1):
                    d_type = instr.descs.type[slot]
                    d_color = instr.descs.color[slot]
                    is_key = d_type == 2  # OBJ_TYPES index of "key"
                    color_locked = jnp.where(
                        d_color == I.COLOR_NONE, locked_colors.any(),
                        locked_colors[jnp.clip(d_color, 0, 5)])
                    bad = active & is_key & color_locked
                    if slot == 2 * i + 1:
                        bad &= is_put  # fixed desc only exists for putnext
                    ok &= ~bad
        return ok

    def _max_steps_value(self, instr):
        if self.fixed_max_steps:
            return jnp.asarray(self.params.max_steps, jnp.int32)
        L = self.layout
        nav_time_maze = L.room_size**2 * L.num_rows * L.num_cols
        return I.num_navs_needed(instr) * nav_time_maze

    def _gen_grid(self, key):
        p = self.params

        def attempt(k):
            k1, k2 = jax.random.split(k)
            b = RG.init_builder(self.layout, k1)
            b, spec, gen_ok = self.gen_mission(k2, b)
            instr = self._instr_from_spec(spec, b)
            ok = gen_ok & self._validate(b, instr)
            extra = {
                "instr": instr,
                "max_steps": self._max_steps_value(instr),
            }
            state = self.make_state(
                b.grid, b.agent_pos, b.agent_dir,
                rng=jax.random.fold_in(k, 1),
                mission=I.surface_tokens(instr), extra=extra)
            return self._finalize_state(state), ok

        state0, ok0 = attempt(key)

        def cond(carry):
            _, ok, n = carry
            return ~ok & (n < self.max_gen_attempts)

        def body(carry):
            state, _, n = carry
            s, ok = attempt(jax.random.fold_in(key, n + 1000))
            return s, ok, n + 1

        state, _, _ = jax.lax.while_loop(
            cond, body, (state0, ok0, jnp.zeros((), jnp.int32)))
        return state

    def step_state(self, key, state, action):
        prev = state
        new_state, reward, terminated = step_core(self.params, state, action)
        status, instr = I.verify(self.params, state.extra["instr"], prev,
                                 new_state, action, USE_DONE_ACTIONS)
        dyn_max = state.extra["max_steps"]
        success = status == I.SUCCESS
        reward = jnp.where(
            success,
            1.0 - 0.9 * new_state.step_count.astype(jnp.float32)
            / dyn_max.astype(jnp.float32),
            jnp.where(status == I.FAILURE, 0.0, reward),
        )
        terminated = terminated | (status != I.CONTINUE)
        truncated = new_state.step_count >= dyn_max
        new_state = new_state.replace(
            terminated=terminated,
            truncated=truncated,
            extra={**state.extra, "instr": instr},
        )
        return new_state, reward, terminated, truncated

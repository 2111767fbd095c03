"""BabyAI instruction language: array encoding, verifier kernel, surface.

Re-design of the reference instruction AST + verifier
(``minigrid/envs/babyai/core/verifier.py:16-568``). The reference tracks
object *identity* through Python references (``carrying is obj``,
``front_cell is door``); identity here reduces to position-history tracking:
objects only move through the agent's hands, one at a time, so each
descriptor carries a boolean position mask of its tracked objects plus one
"currently carried object is tracked" bit — updated on pickup/drop/box-toggle
transitions. That reproduces the reference's ``find_matching_objs(
use_location=False)`` identity semantics exactly, including the quirk that
``obj_poss`` (used by GoTo) refreshes only on drop actions
(roomgrid_level.py:91-93).

An instruction is a fixed-capacity tree: root combinator over two parts,
each part a single action or an ``and`` of two, giving 4 leaf slots — the
exact grammar produced by LevelGen (levelgen.py:158-211). All structure
fields are traced data, so one compiled verifier serves every instruction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.mission import WORD_TO_ID
from minigrid_tpu.core.types import MISSION_LEN

# Vocabulary index spaces (verifier.py:16-22)
OBJ_TYPES = ["box", "ball", "key", "door"]       # descriptor type order
TYPE_IDS = jnp.asarray([C.BOX, C.BALL, C.KEY, C.DOOR], jnp.int32)
TYPE_NONE = 4
COLOR_NONE = 6
LOC_NAMES = ["left", "right", "front", "behind"]
LOC_NONE = 4

# leaf kinds
OPEN, GOTO, PICKUP, PUTNEXT, UNUSED = 0, 1, 2, 3, 4
# root kinds
ROOT_ACTION, ROOT_AND, ROOT_BEFORE, ROOT_AFTER = 0, 1, 2, 3

CONTINUE, SUCCESS, FAILURE = 0, 1, 2


@struct.dataclass
class Descs:
    """8 descriptor slots (leaf i uses slots 2i = move/primary, 2i+1 =
    fixed). All leading dims are 8.

    Position masks are stored x-bit-packed: ``(8, H)`` uint32 where bit
    ``x`` of element ``[slot, y]`` means cell ``(x, y)`` is in the set
    (grids are at most 32 wide). The verifier carries these through every
    env step, so packing cuts the dominant HBM traffic of the BabyAI hot
    loop ~8x vs ``(8, W, H)`` bool planes (profiled: the mask blend +
    any-reduce fusions were ~half the GoToObj step cost); all hot-path
    operations — front-cell membership, pickup/drop blends, 4-neighbor
    adjacency — are single bitwise ops on the packed rows. Use
    :func:`pack_mask` / :func:`unpack_mask` at the (init-time/host-side)
    boundaries."""

    type: jax.Array     # (8,) int32 in [0..4]
    color: jax.Array    # (8,) int32 in [0..6]
    loc: jax.Array      # (8,) int32 in [0..4]
    count: jax.Array    # (8,) int32 |obj_set| at reset
    mask_objs: jax.Array  # (8, H) uint32 — tracked objects now on grid
    mask_poss: jax.Array  # (8, H) uint32 — stale obj_poss (drop-refreshed)
    carried: jax.Array  # (8,) bool — carried object is tracked


def pack_mask(mask: jax.Array) -> jax.Array:
    """``(..., W, H)`` bool -> ``(..., H)`` uint32, bit ``x`` = column x.

    Width is capped at 24, not 32: packed rows ride the fresh-reset
    routing contraction (envs/base.py ``_fresh_select``), which mixes
    integer leaves through a float32 one-hot matmul and is exact only
    below 2^24. The BabyAI catalog maxes out at W = 22."""
    W = mask.shape[-2]
    assert W <= 24, f"packed masks need width <= 24, got {W}"
    bits = jnp.uint32(1) << jnp.arange(W, dtype=jnp.uint32)
    return jnp.sum(mask.astype(jnp.uint32) * bits[:, None], axis=-2,
                   dtype=jnp.uint32)


def unpack_mask(packed: jax.Array, width: int) -> jax.Array:
    """``(..., H)`` uint32 -> ``(..., W, H)`` bool."""
    bits = jnp.arange(width, dtype=jnp.uint32)
    return ((packed[..., None, :] >> bits[:, None]) & 1).astype(bool)


@struct.dataclass
class InstrState:
    root_kind: jax.Array   # () int32
    a_is_and: jax.Array    # () bool
    b_is_and: jax.Array    # () bool
    kinds: jax.Array       # (4,) int32 leaf kinds
    strict: jax.Array      # (4,) bool
    descs: Descs
    # dynamic verifier memory
    pre_empty: jax.Array         # (4,) bool — carrying empty at last invoke
    pre_move_carried: jax.Array  # (4,) bool — carried∈move-set at last invoke
    last_match: jax.Array        # (4,) bool — done-actions mode memo
    leaf_done: jax.Array         # (4,) bool
    a_done: jax.Array            # () bool
    b_done: jax.Array            # () bool


def empty_descs(width: int, height: int) -> Descs:
    # 24, not 32: see pack_mask (f32 fresh-reset routing exactness)
    assert width <= 24, f"packed masks need width <= 24, got {width}"
    z8 = jnp.zeros(8, jnp.int32)
    return Descs(
        type=z8 + TYPE_NONE,
        color=z8 + COLOR_NONE,
        loc=z8 + LOC_NONE,
        count=z8,
        mask_objs=jnp.zeros((8, height), jnp.uint32),
        mask_poss=jnp.zeros((8, height), jnp.uint32),
        carried=jnp.zeros(8, bool),
    )


def empty_instr(width: int, height: int) -> InstrState:
    return InstrState(
        root_kind=jnp.zeros((), jnp.int32),
        a_is_and=jnp.zeros((), bool),
        b_is_and=jnp.zeros((), bool),
        kinds=jnp.full((4,), UNUSED, jnp.int32),
        strict=jnp.zeros(4, bool),
        descs=empty_descs(width, height),
        pre_empty=jnp.zeros(4, bool),
        pre_move_carried=jnp.zeros(4, bool),
        last_match=jnp.zeros(4, bool),
        leaf_done=jnp.zeros(4, bool),
        a_done=jnp.zeros((), bool),
        b_done=jnp.zeros((), bool),
    )


def match_mask(grid, agent_pos, agent_dir, room_rect, dtype, color, loc):
    """find_matching_objs at reset (verifier.py:105-171): which cells match
    a (type, color, loc) descriptor. ``room_rect`` is the agent's starting
    room (location words only apply there)."""
    cellt = grid[..., 0].astype(jnp.int32)
    cellc = grid[..., 1].astype(jnp.int32)
    nonempty = cellt != C.EMPTY
    type_ok = jnp.where(dtype == TYPE_NONE, True, cellt == TYPE_IDS[jnp.clip(dtype, 0, 3)])
    color_ok = jnp.where(color == COLOR_NONE, True, cellc == color)

    W, H = cellt.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
    vx = xs - agent_pos[0]
    vy = ys - agent_pos[1]
    d1 = jnp.asarray(C.DIR_TO_VEC)[agent_dir]
    d2x, d2y = -d1[1], d1[0]
    dot1 = vx * d1[0] + vy * d1[1]
    dot2 = vx * d2x + vy * d2y
    loc_cond = jnp.select(
        [loc == 0, loc == 1, loc == 2, loc == 3],
        [dot2 < 0, dot2 > 0, dot1 > 0, dot1 < 0],
        default=jnp.ones((W, H), bool),
    )
    loc_ok = jnp.where(loc == LOC_NONE, True, room_rect & loc_cond)
    return nonempty & type_ok & color_ok & loc_ok


def init_desc_slot(descs: Descs, slot, grid, agent_pos, agent_dir, room_rect,
                   dtype, color, loc) -> Descs:
    mask = match_mask(grid, agent_pos, agent_dir, room_rect, dtype, color, loc)
    packed = pack_mask(mask)
    return descs.replace(
        type=descs.type.at[slot].set(jnp.asarray(dtype, jnp.int32)),
        color=descs.color.at[slot].set(jnp.asarray(color, jnp.int32)),
        loc=descs.loc.at[slot].set(jnp.asarray(loc, jnp.int32)),
        count=descs.count.at[slot].set(mask.sum().astype(jnp.int32)),
        mask_objs=descs.mask_objs.at[slot].set(packed),
        mask_poss=descs.mask_poss.at[slot].set(packed),
        carried=descs.carried.at[slot].set(False),
    )


def _front_mask(params, state):
    """(W, H) one-hot mask of the cell in front of the agent.

    Gather-free (per-env dynamic indexing serializes on TPU); all-false when
    the front cell is out of bounds (agents sit inside the wall rim, so that
    only happens in degenerate grids).
    """
    d = jnp.asarray(state.agent_dir, jnp.int32)
    fx = state.agent_pos[0] + (d == 0).astype(jnp.int32) - (d == 2)
    fy = state.agent_pos[1] + (d == 1).astype(jnp.int32) - (d == 3)
    W, H = params.width, params.height
    xs = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
    return (xs == fx) & (ys == fy)


def _front_mask_packed(params, state):
    """(H,) uint32 bit-packed one-hot of the cell in front of the agent
    (the packed-row counterpart of :func:`_front_mask`)."""
    d = jnp.asarray(state.agent_dir, jnp.int32)
    fx = state.agent_pos[0] + (d == 0).astype(jnp.int32) - (d == 2)
    fy = state.agent_pos[1] + (d == 1).astype(jnp.int32) - (d == 3)
    W, H = params.width, params.height
    in_x = (fx >= 0) & (fx < W)
    bit = jnp.where(in_x,
                    jnp.uint32(1) << jnp.clip(fx, 0, 31).astype(jnp.uint32),
                    jnp.uint32(0))
    ys = jnp.arange(H, dtype=jnp.int32)
    return jnp.where(ys == fy, bit, jnp.uint32(0))


def _front_type_state(grid, fm):
    """(type, door_state) of the front cell, via the one-hot mask.

    Combines only the two observed channels inline (a full
    ``pack_cells(grid)`` materializes a (W, H) int32 grid copy; this
    2-channel combine fuses into the reduction)."""
    ps = (grid[..., 0].astype(jnp.int32)
          | (grid[..., 2].astype(jnp.int32) << 7))
    packed = jnp.sum(jnp.where(fm, ps, 0))
    return packed & 15, (packed >> 7) & 3


def update_tracking(params, descs: Descs, prev, new, action) -> Descs:
    """Identity/position tracking across one env transition."""
    action = jnp.asarray(action, jnp.int32)
    fm = _front_mask(params, prev)
    fmp = _front_mask_packed(params, prev)
    was_empty = prev.carrying[0] == C.EMPTY
    now_empty = new.carrying[0] == C.EMPTY
    picked = (action == Actions.pickup) & was_empty & ~now_empty
    dropped = (action == Actions.drop) & ~was_empty & now_empty
    ftype, _ = _front_type_state(prev.grid, fm)
    box_gone = (action == Actions.toggle) & (ftype == C.BOX)

    at_front = jnp.any(descs.mask_objs & fmp[None], axis=1)  # (8,)
    take = picked & at_front
    lose_box = box_gone & at_front
    gain = dropped & descs.carried

    # set/clear the front-cell bit per slot
    front_in = (at_front & ~take & ~lose_box) | gain
    mask_objs = jnp.where(front_in[:, None],
                          descs.mask_objs | fmp[None],
                          descs.mask_objs & ~fmp[None])
    carried = jnp.where(take, True, jnp.where(gain, False, descs.carried))
    # obj_poss refresh happens on every drop action (roomgrid_level.py:91-93)
    mask_poss = jnp.where(action == Actions.drop, mask_objs, descs.mask_poss)
    return descs.replace(mask_objs=mask_objs, mask_poss=mask_poss,
                         carried=carried)


def _leaf_commons(params, prev, new):
    """The leaf-independent per-step quantities, computed ONCE per verify
    call (they were recomputed inside every per-leaf invocation — 8x per
    step — which made the verifier the BabyAI hot loop's op-count bomb)."""
    fm = _front_mask(params, new)
    fmp = _front_mask_packed(params, new)
    ftype, fstate = _front_type_state(new.grid, fm)
    # packed 4-neighborhood: x+-1 are bit shifts, y+-1 are row shifts
    z = jnp.zeros((1,), jnp.uint32)
    neigh = ((fmp << 1) | (fmp >> 1)
             | jnp.concatenate([fmp[1:], z])
             | jnp.concatenate([z, fmp[:-1]]))
    return (fmp, ftype, fstate, new.carrying[0] != C.EMPTY,
            prev.carrying[0] == C.EMPTY, new.carrying[0] == C.EMPTY, neigh)


def _leaf_verify_all(instr: InstrState, gates, new, action,
                     use_done_actions: bool, commons):
    """Result + memory updates for ALL FOUR leaf slots in one vectorized
    pass, each applied only under its ``gates`` (4,) entry. Exactly the
    per-slot semantics of the reference verifier (verifier.py:254-433) —
    slots never read each other's memos, so the vectorization is exact —
    at ~1/4 the op count of four sequential slot passes."""
    action = jnp.asarray(action, jnp.int32)
    (fmp, ftype, fstate, now_carrying, was_empty, now_empty,
     neigh) = commons
    kinds = instr.kinds                    # (4,)
    strict = instr.strict                  # (4,)
    d = instr.descs
    mo = d.mask_objs[0::2]                 # (4, H) packed move descriptors
    mp = d.mask_poss[0::2]
    fx = d.mask_poss[1::2]                 # fixed descriptors (putnext)
    carried_mv = d.carried[0::2]           # (4,)

    # --- open (verifier.py:254-288) ---
    front_is_door = ftype == C.DOOR
    open_success = (
        (action == Actions.toggle)
        & jnp.any(mo & fmp[None], axis=1)
        & front_is_door
        & (fstate == C.OPEN)
    )
    open_fail = (
        (action == Actions.toggle) & strict & front_is_door & ~open_success
    )

    # --- goto (verifier.py:290-317): stale obj_poss ---
    goto_success = jnp.any(mp & fmp[None], axis=1)

    # --- pickup (verifier.py:319-362) ---
    pk = action == Actions.pickup
    pickup_success = pk & instr.pre_empty & carried_mv & now_carrying
    pickup_fail = pk & strict & now_carrying & ~pickup_success

    # --- putnext (verifier.py:365-433) ---
    drop_ok = (action == Actions.drop) & ~was_empty & now_empty
    adjacent = jnp.any(fx & neigh[None], axis=1)
    put_success = drop_ok & instr.pre_move_carried & adjacent
    put_fail = pk & strict & now_carrying

    success = jnp.select(
        [kinds == OPEN, kinds == GOTO, kinds == PICKUP, kinds == PUTNEXT],
        [open_success, goto_success, pickup_success, put_success],
        default=jnp.zeros((4,), bool),
    )
    fail = jnp.select(
        [kinds == OPEN, kinds == GOTO, kinds == PICKUP, kinds == PUTNEXT],
        [open_fail, jnp.zeros((4,), bool), pickup_fail,
         put_fail & ~put_success],
        default=jnp.zeros((4,), bool),
    )

    if use_done_actions:
        # verify() in done-actions mode (verifier.py:228-242): 'done' reports
        # the memo; other actions return None (-> continue) while updating it
        is_done_a = action == Actions.done
        reported_success = is_done_a & instr.last_match
        reported_fail = is_done_a & ~instr.last_match
        instr = instr.replace(last_match=jnp.where(
            gates & ~is_done_a, success, instr.last_match))
        success, fail = reported_success, reported_fail

    success &= gates
    fail &= gates

    # memory updates happen whenever invoked (verify_action entry)
    verify_runs = (gates if not use_done_actions
                   else (gates & (action != Actions.done)))
    upd_pre = verify_runs & ((kinds == PICKUP) | (kinds == PUTNEXT))
    instr = instr.replace(
        pre_empty=jnp.where(upd_pre, ~now_carrying, instr.pre_empty),
        pre_move_carried=jnp.where(upd_pre, carried_mv,
                                   instr.pre_move_carried),
        leaf_done=instr.leaf_done | success,
    )
    return instr, success, fail


def verify(params, instr: InstrState, prev, new, action,
           use_done_actions: bool = False):
    """One verifier step. Returns (status in {CONTINUE, SUCCESS, FAILURE},
    new InstrState). Call after the env transition (roomgrid_level.py:87-104).
    """
    descs = update_tracking(params, instr.descs, prev, new, action)
    instr = instr.replace(descs=descs)
    commons = _leaf_commons(params, prev, new)

    rk = instr.root_kind
    is_before = rk == ROOT_BEFORE
    is_after = rk == ROOT_AFTER

    # ---- phase 1: the part that runs first ----
    # before/and/action: A part first; after: B part first
    gA1 = (
        jnp.where(rk == ROOT_ACTION, ~instr.leaf_done[0],
        jnp.where(rk == ROOT_AND, ~instr.leaf_done[0],
        jnp.where(is_before, ~instr.a_done & ~instr.leaf_done[0], False)))
    )
    gA2 = jnp.where(rk == ROOT_AND, ~instr.leaf_done[1],
          jnp.where(is_before, ~instr.a_done & instr.a_is_and
                    & ~instr.leaf_done[1], False))
    gB1_p1 = is_after & ~instr.b_done & ~instr.leaf_done[2]
    gB2_p1 = is_after & ~instr.b_done & instr.b_is_and & ~instr.leaf_done[3]

    instr, s1v, f1v = _leaf_verify_all(
        instr, jnp.stack([gA1, gA2, gB1_p1, gB2_p1]), new, action,
        use_done_actions, commons)
    fails = f1v.any()

    a_part_done = instr.leaf_done[0] & (~instr.a_is_and | instr.leaf_done[1])
    b_part_done = instr.leaf_done[2] & (~instr.b_is_and | instr.leaf_done[3])
    a_done = instr.a_done | a_part_done
    b_done = instr.b_done | b_part_done

    # ---- phase 2: the other part, gated on phase-1 completion ----
    gB1 = is_before & a_done & ~instr.leaf_done[2]
    gB2 = is_before & a_done & instr.b_is_and & ~instr.leaf_done[3]
    gA1_p2 = is_after & b_done & ~instr.leaf_done[0]
    gA2_p2 = is_after & b_done & instr.a_is_and & ~instr.leaf_done[1]

    instr, s2v, f2v = _leaf_verify_all(
        instr, jnp.stack([gA1_p2, gA2_p2, gB1, gB2]), new, action,
        use_done_actions, commons)
    fails |= f2v.any()

    a_part_done = instr.leaf_done[0] & (~instr.a_is_and | instr.leaf_done[1])
    b_part_done = instr.leaf_done[2] & (~instr.b_is_and | instr.leaf_done[3])
    a_done = instr.a_done | a_part_done
    b_done = instr.b_done | b_part_done
    instr = instr.replace(a_done=a_done, b_done=b_done)

    success = jnp.select(
        [rk == ROOT_ACTION, rk == ROOT_AND, is_before, is_after],
        [instr.leaf_done[0],
         instr.leaf_done[0] & instr.leaf_done[1],
         a_done & b_done,
         a_done & b_done],
        default=jnp.zeros((), bool),
    )
    # AndInstr swallows child failures outside done-actions mode
    # (verifier.py:533-568); action/seq roots propagate them
    fail_counts = jnp.where(rk == ROOT_AND, jnp.asarray(use_done_actions), True)
    status = jnp.where(success, SUCCESS,
                       jnp.where(fails & fail_counts, FAILURE, CONTINUE))
    return status.astype(jnp.int32), instr


def num_navs_needed(instr: InstrState):
    """Dynamic step-budget factor (roomgrid_level.py:216-236)."""
    per_leaf = jnp.where(
        instr.kinds == PUTNEXT, 2, jnp.where(instr.kinds == UNUSED, 0, 1)
    )
    active = jnp.select(
        [instr.root_kind == ROOT_ACTION, instr.root_kind == ROOT_AND],
        [jnp.asarray([1, 0, 0, 0]), jnp.asarray([1, 1, 0, 0])],
        default=jnp.stack([
            jnp.ones((), jnp.int32), instr.a_is_and.astype(jnp.int32),
            jnp.ones((), jnp.int32), instr.b_is_and.astype(jnp.int32),
        ]),
    )
    return (per_leaf * active).sum()


# ---------------------------------------------------------------------------
# Surface realization as mission tokens (verifier.py surface methods)
# ---------------------------------------------------------------------------

_W = WORD_TO_ID
TYPE_WORDS = jnp.asarray([_W["box"], _W["ball"], _W["key"], _W["door"],
                          _W["object"]], jnp.int32)
COLOR_WORDS = jnp.asarray(
    [_W[C.IDX_TO_COLOR[i]] for i in range(6)] + [0], jnp.int32)
LOC_SEGMENTS = jnp.asarray([
    [_W["on"], _W["your"], _W["left"], 0],
    [_W["on"], _W["your"], _W["right"], 0],
    [_W["in"], _W["front"], _W["of"], _W["you"]],
    [_W["behind"], _W["you"], 0, 0],
    [0, 0, 0, 0],
], jnp.int32)


def _desc_tokens(d: Descs, slot):
    """(7,) tokens + valid for one descriptor (verifier.py:73-103)."""
    article = jnp.where(d.count[slot] > 1, _W["a"], _W["the"])
    color_tok = COLOR_WORDS[d.color[slot]]
    type_tok = TYPE_WORDS[d.type[slot]]
    loc_seg = LOC_SEGMENTS[d.loc[slot]]
    toks = jnp.concatenate([
        jnp.stack([article, color_tok, type_tok]), loc_seg])
    valid = toks != 0
    return toks, valid


def _leaf_tokens(instr: InstrState, i: int):
    """(18,) tokens + valid for one leaf."""
    kind = instr.kinds[i]
    verb = jnp.select(
        [kind == OPEN, kind == GOTO, kind == PICKUP, kind == PUTNEXT],
        [jnp.asarray([_W["open"], 0]), jnp.asarray([_W["go"], _W["to"]]),
         jnp.asarray([_W["pick"], _W["up"]]), jnp.asarray([_W["put"], 0])],
        default=jnp.zeros(2, jnp.int32),
    )
    mt, mv = _desc_tokens(instr.descs, 2 * i)
    ft, fv = _desc_tokens(instr.descs, 2 * i + 1)
    is_put = kind == PUTNEXT
    mid = jnp.where(is_put, jnp.asarray([_W["next"], _W["to"]]),
                    jnp.zeros(2, jnp.int32))
    toks = jnp.concatenate([verb, mt, mid, jnp.where(is_put, ft, 0)])
    valid = jnp.concatenate([verb != 0, mv, mid != 0, fv & is_put])
    used = kind != UNUSED
    return toks, valid & used


def surface_tokens(instr: InstrState) -> jax.Array:
    """(MISSION_LEN,) int32 mission ids for the instruction tree."""
    rk = instr.root_kind
    t0, v0 = _leaf_tokens(instr, 0)
    t1, v1 = _leaf_tokens(instr, 1)
    t2, v2 = _leaf_tokens(instr, 2)
    t3, v3 = _leaf_tokens(instr, 3)

    and_a = jnp.asarray([_W["and"]])
    use_a2 = (rk == ROOT_AND) | (((rk == ROOT_BEFORE) | (rk == ROOT_AFTER))
                                 & instr.a_is_and)
    use_b = (rk == ROOT_BEFORE) | (rk == ROOT_AFTER)
    use_b2 = use_b & instr.b_is_and

    conn_seq = jnp.where(
        rk == ROOT_BEFORE,
        jnp.asarray([_W[","], _W["then"]]),
        jnp.asarray([_W["after"], _W["you"]]),
    )

    toks = jnp.concatenate([
        t0, and_a, t1, conn_seq, t2, and_a, t3])
    valid = jnp.concatenate([
        v0,
        jnp.asarray([use_a2]), v1 & use_a2,
        jnp.asarray([use_b, use_b]), v2 & use_b,
        jnp.asarray([use_b2]), v3 & use_b2,
    ])

    # compact valid tokens into the padded mission vector; invalid slots
    # scatter out of bounds and are dropped
    pos = jnp.cumsum(valid) - 1
    out = jnp.zeros(MISSION_LEN, jnp.int32)
    out = out.at[jnp.where(valid, pos, MISSION_LEN)].set(toks, mode="drop")
    return out

"""The branchless environment transition kernel.

Re-design of the reference hot loop (``minigrid/minigrid_env.py:525-595``):
the action branch ladder, the per-object virtual dispatch (``can_overlap``/
``can_pickup``/``toggle``, world_object.py:45-63,177-194,290-293) and the
mutable grid update all become a fixed dataflow of compares and
``where`` selects — so thousands of envs step in lockstep under
``jit(vmap(step))`` with no divergent control flow. The front-cell read and
write deliberately avoid gather/scatter (per-env dynamic indexing serializes
on TPU): both are one-hot coordinate masks over the whole (W, H) grid, fused
by XLA into a few elementwise passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.types import EnvParams, EnvState


def reward_on_success(params: EnvParams, step_count) -> jax.Array:
    """``1 - 0.9 * step_count / max_steps`` (minigrid_env.py:240-245)."""
    return 1.0 - 0.9 * (step_count.astype(jnp.float32) / params.max_steps)


def front_cell(params: EnvParams, state: EnvState):
    """Gather-free read of the cell in front of the agent
    (minigrid_env.py:535-538 / front_pos :419-424).

    Returns ``(fwd, in_bounds, front_mask, fwd_cell)``: the forward
    coordinate, its validity, the one-hot (W, H) coordinate mask used for
    the read (reusable for the scatter-free write), and the (5,) cell value
    (a Wall when out of bounds). Shared by :func:`step_core` and any
    consumer that must see exactly what the transition sees (e.g. the
    NoDeath wrapper's pre-step death check)."""
    # DIR_TO_VEC as arithmetic: dirs 0..3 -> (1,0) (0,1) (-1,0) (0,-1)
    d = state.agent_dir
    dvec = jnp.stack(
        [
            (d == 0).astype(jnp.int32) - (d == 2),
            (d == 1).astype(jnp.int32) - (d == 3),
        ]
    )
    fwd = state.agent_pos + dvec
    W, H = params.width, params.height
    in_bounds = (fwd[0] >= 0) & (fwd[0] < W) & (fwd[1] >= 0) & (fwd[1] < H)
    # gather-free read of the front cell via a one-hot coordinate mask
    xs = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
    front_mask = (xs == fwd[0]) & (ys == fwd[1])  # all-false when OOB
    packed_grid = G.pack_cells(state.grid)
    # statically unrolled two-stage select-accumulate instead of a full
    # (W, H) masked-sum reduction: reductions break XLA fusion and force an
    # HBM round-trip per scan step (see core/obs.py docstring)
    row = jnp.zeros((H,), jnp.int32)
    for x in range(W):
        row = row + jnp.where(fwd[0] == x, packed_grid[x], 0)
    val = jnp.zeros((), jnp.int32)
    for y in range(H):
        val = val + jnp.where(fwd[1] == y, row[y], 0)
    fwd_cell = G.unpack_cells(jnp.where(in_bounds, val, G.WALL_PACKED))
    return fwd, in_bounds, front_mask, fwd_cell


def step_core(params: EnvParams, state: EnvState, action) -> tuple[EnvState, jax.Array, jax.Array]:
    """One transition. Returns (new_state, reward, terminated).

    Truncation (step_count >= max_steps, minigrid_env.py:587) is recorded in
    ``new_state.truncated``; callers compose it with env-specific reward /
    termination overrides before generating observations.
    """
    action = jnp.asarray(action, jnp.int32)
    step_count = state.step_count + 1

    # --- direction update (minigrid_env.py:541-548) --------------------
    turn = jnp.where(
        action == Actions.left, -1, jnp.where(action == Actions.right, 1, 0)
    )
    new_dir = (state.agent_dir + turn) % 4

    # --- front cell (minigrid_env.py:535-538) --------------------------
    fwd, in_bounds, front_mask, fwd_cell = front_cell(params, state)
    ftype = fwd_cell[0].astype(jnp.int32)
    fcolor = fwd_cell[1]
    fstate = fwd_cell[2]

    carrying = state.carrying
    is_carrying = carrying[0] != C.EMPTY

    # --- forward (minigrid_env.py:551-558) -----------------------------
    # CAN_OVERLAP_TABLE (constants.py:87) inlined as compares — a per-env
    # gather from an 11-entry table costs more than four equality tests
    can_overlap = (
        (ftype == C.EMPTY)
        | (ftype == C.FLOOR)
        | (ftype == C.GOAL)
        | (ftype == C.LAVA)
        | ((ftype == C.DOOR) & (fstate == C.OPEN))
    )
    is_forward = action == Actions.forward
    new_pos = jnp.where(is_forward & can_overlap & in_bounds, fwd, state.agent_pos)
    hits_goal = is_forward & (ftype == C.GOAL)
    hits_lava = is_forward & (ftype == C.LAVA)
    terminated = hits_goal | hits_lava
    reward = jnp.where(hits_goal, reward_on_success(params, step_count), 0.0)

    # --- pickup (minigrid_env.py:561-566) ------------------------------
    do_pickup = (
        (action == Actions.pickup)
        & ((ftype == C.KEY) | (ftype == C.BALL) | (ftype == C.BOX))
        & ~is_carrying
    )

    # --- drop (minigrid_env.py:569-573) --------------------------------
    do_drop = (action == Actions.drop) & (ftype == C.EMPTY) & is_carrying

    # --- toggle: door unlock/open/close (world_object.py:184-194) ------
    is_toggle = action == Actions.toggle
    is_door = ftype == C.DOOR
    has_matching_key = (carrying[0] == C.KEY) & (carrying[1] == fcolor)
    unlocks = (fstate == C.LOCKED) & has_matching_key
    # unlocked doors flip open<->closed; locked doors only open with the key
    toggled_door_state = jnp.where(
        fstate == C.LOCKED,
        jnp.where(unlocks, C.OPEN, C.LOCKED),
        jnp.where(fstate == C.OPEN, C.CLOSED, C.OPEN),
    ).astype(jnp.uint8)
    # channel blend, not a scatter — keeps the hot path in the op class
    # verified exact on TPU at any batch (see core/grid.py onehot_set)
    door_cell = jnp.where(jnp.arange(fwd_cell.shape[0]) == 2,
                          toggled_door_state, fwd_cell)

    # --- toggle: box reveals contents (world_object.py:290-293) --------
    is_box = ftype == C.BOX
    has_contents = fwd_cell[3] != 0
    contents_cell = jnp.where(
        has_contents,
        jnp.stack(
            [
                fwd_cell[3],
                fwd_cell[4],
                jnp.zeros((), jnp.uint8),
                jnp.zeros((), jnp.uint8),
                jnp.zeros((), jnp.uint8),
            ]
        ),
        jnp.asarray(C.EMPTY_CELL),
    )

    # --- resolve the front cell's new value ----------------------------
    new_fwd_cell = fwd_cell
    new_fwd_cell = jnp.where(do_pickup, jnp.asarray(C.EMPTY_CELL), new_fwd_cell)
    new_fwd_cell = jnp.where(do_drop, carrying, new_fwd_cell)
    new_fwd_cell = jnp.where(is_toggle & is_door, door_cell, new_fwd_cell)
    new_fwd_cell = jnp.where(is_toggle & is_box, contents_cell, new_fwd_cell)

    write = in_bounds & (do_pickup | do_drop | (is_toggle & (is_door | is_box)))
    # scatter-free write: blend the new cell in through the coordinate mask
    new_grid = jnp.where(
        (front_mask & write)[..., None], new_fwd_cell, state.grid
    )

    new_carrying = jnp.where(
        do_pickup, fwd_cell, jnp.where(do_drop, jnp.asarray(C.EMPTY_CELL), carrying)
    )

    truncated = step_count >= params.max_steps

    new_state = state.replace(
        grid=new_grid,
        agent_pos=new_pos,
        agent_dir=new_dir,
        carrying=new_carrying,
        step_count=step_count,
        terminated=terminated,
        truncated=truncated,
    )
    return new_state, reward, terminated

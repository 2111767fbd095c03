"""Fused multi-step rollout kernel (Pallas, TPU).

The XLA hot loop (``jit(scan(vmap(step)))``, see bench.py) pays one HBM
round-trip of the full batched carry per environment step, plus kernel
boundaries at every reduction inside the observation read. This kernel runs
``T`` whole environment transitions — the branchless transition of
``core/step.py`` (reference ``minigrid/minigrid_env.py:525-595``) fused with
the egocentric observation of ``core/obs.py`` + ``core/visibility.py``
(reference ``minigrid_env.py:597-650``, ``core/grid.py:291-328``) — with the
entire batch state resident in VMEM, reading HBM only for the action stream
and writing it only for the final state and per-env accumulators.

Layout: the batch is carried as ``(rows, 8, 128)`` int32 tiles — batch across
lanes and sublanes, so every per-env scalar is a full native VPU tile and all
64 grid cells of an env live in one lane column. Cell reads/writes are one-hot
select chains over the 64 cell rows (the same gather-free design as the XLA
path: per-lane dynamic gathers do not vectorize on TPU).

Scope: environments whose ``step`` is exactly ``step_core`` + ``gen_obs``
with no per-family overrides and no in-episode RNG (Empty, DoorKey, FourRooms,
LavaGap builds, ...) — the same contract the throughput baseline measures.
Parity with the XLA path is asserted cell-exactly in
``tests/test_fused_rollout.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.types import EnvParams, EnvState

SUB, LANE = 8, 128          # one VPU tile of environments
TILE = SUB * LANE


def supports_fused_rollout(env, batch: int) -> bool:
    """True when ``env``'s step is the pure core transition and the batch
    fills whole VPU tiles."""
    from minigrid_tpu.envs.base import MiniGridEnv

    cls = type(env)
    p = env.params
    return (
        cls.step is MiniGridEnv.step
        and cls._transform_action is MiniGridEnv._transform_action
        and cls._pre_step is MiniGridEnv._pre_step
        and cls._post_step is MiniGridEnv._post_step
        and batch % TILE == 0
        and p.view_size <= 31  # row bit-packing headroom in int32
    )


def _row_pass_bits(seed, t, V: int, full: int):
    """Bit-packed visibility row sweep — mirrors core/visibility.py:26-59
    on (8, 128) int32 tiles."""
    m = seed
    T = (t << 1) & full
    shift = 1
    while shift < V:
        m |= (m << shift) & T
        T &= (T << shift) & full
        shift *= 2
    m1 = m
    U = t >> 1
    shift = 1
    while shift < V:
        m |= (m >> shift) & U
        U &= U >> shift
        shift *= 2
    m2 = m
    e = m1 & t & (full >> 1)
    up1 = e | ((e << 1) & full)
    f = m2 & t & (full ^ 1)
    up2 = f | (f >> 1)
    return m2, up1 | up2


def _make_kernel(W: int, H: int, V: int, max_steps: int, see_through: bool):
    N = W * H
    FULL = (1 << V) - 1
    hs = V // 2
    WALLP = int(G.WALL_PACKED)
    EMPTYP = int(G.EMPTY_PACKED)

    def kernel(actions_ref, grid_ref, px_ref, py_ref, pd_ref, cr_ref, sc_ref,
               ogrid_ref, opx_ref, opy_ref, opd_ref, ocr_ref, osc_ref,
               oterm_ref, orew_ref, oprobe_ref):
        T = actions_ref.shape[0]

        def body(t, carry):
            grid, px, py, pd, cr, sc, term, rew, probe = carry
            a = actions_ref[t]                              # (8, 128) int32
            sc = sc + 1

            # ---- transition (core/step.py:30-162) -----------------------
            turn = jnp.where(a == int(Actions.left), -1,
                             jnp.where(a == int(Actions.right), 1, 0))
            nd = (pd + turn) & 3
            fx = px + (pd == 0).astype(jnp.int32) - (pd == 2)
            fy = py + (pd == 1).astype(jnp.int32) - (pd == 3)
            inb = (fx >= 0) & (fx < W) & (fy >= 0) & (fy < H)
            fidx = jnp.where(inb, fx * H + fy, -1)

            f = jnp.full(a.shape, WALLP, jnp.int32)
            for c in range(N):
                f = jnp.where(fidx == c, grid[c], f)
            ftype = f & 15
            fcolor = (f >> 4) & 7
            fstate = (f >> 7) & 3

            is_carrying = (cr & 15) != C.EMPTY
            can_overlap = (
                (ftype == C.EMPTY) | (ftype == C.FLOOR) | (ftype == C.GOAL)
                | (ftype == C.LAVA) | ((ftype == C.DOOR) & (fstate == C.OPEN))
            )
            is_fwd = a == int(Actions.forward)
            move = is_fwd & can_overlap & inb
            npx = jnp.where(move, fx, px)
            npy = jnp.where(move, fy, py)
            hits_goal = is_fwd & (ftype == C.GOAL)
            term = hits_goal | (is_fwd & (ftype == C.LAVA))
            rew = rew + jnp.where(
                hits_goal,
                1.0 - 0.9 * sc.astype(jnp.float32) / max_steps,
                0.0,
            )

            do_pickup = (
                (a == int(Actions.pickup))
                & ((ftype == C.KEY) | (ftype == C.BALL) | (ftype == C.BOX))
                & ~is_carrying
            )
            do_drop = (a == int(Actions.drop)) & (ftype == C.EMPTY) & is_carrying
            is_toggle = a == int(Actions.toggle)
            is_door = ftype == C.DOOR
            is_box = ftype == C.BOX
            has_key = ((cr & 15) == C.KEY) & (((cr >> 4) & 7) == fcolor)
            new_door_state = jnp.where(
                fstate == C.LOCKED,
                jnp.where(has_key, C.OPEN, C.LOCKED),
                jnp.where(fstate == C.OPEN, C.CLOSED, C.OPEN),
            )
            door_cell = (f & ~(3 << 7)) | (new_door_state << 7)
            fcont = (f >> 9) & 127                   # contents type|color<<4
            box_cell = jnp.where(fcont != 0, fcont, EMPTYP)

            newcell = f
            newcell = jnp.where(do_pickup, EMPTYP, newcell)
            newcell = jnp.where(do_drop, cr, newcell)
            newcell = jnp.where(is_toggle & is_door, door_cell, newcell)
            newcell = jnp.where(is_toggle & is_box, box_cell, newcell)
            write = do_pickup | do_drop | (is_toggle & (is_door | is_box))

            rows = [jnp.where((fidx == c) & write, newcell, grid[c])
                    for c in range(N)]
            grid = jnp.stack(rows)
            cr = jnp.where(do_pickup, f, jnp.where(do_drop, EMPTYP, cr))

            # ---- observation (core/obs.py:53-106) -----------------------
            ffx = (nd == 0).astype(jnp.int32) - (nd == 2)
            ffy = (nd == 1).astype(jnp.int32) - (nd == 3)
            rx, ry = -ffy, ffx
            tlx = npx + ffx * (V - 1) - rx * hs
            tly = npy + ffy * (V - 1) - ry * hs
            swap = (nd == 0) | (nd == 2)

            u = [[None] * V for _ in range(V)]
            for m in range(V):
                wxm = tlx + (rx - ffx) * m
                inbx = (wxm >= 0) & (wxm < W)
                tm = jnp.zeros((H,) + a.shape, jnp.int32)
                for w in range(W):
                    tm = jnp.where((wxm == w)[None], grid[w * H:(w + 1) * H], tm)
                for n in range(V):
                    wyn = tly + (ry - ffy) * n
                    un = jnp.zeros_like(a)
                    for h in range(H):
                        un = jnp.where(wyn == h, tm[h], un)
                    inby = (wyn >= 0) & (wyn < H)
                    u[m][n] = jnp.where(inbx & inby, un, WALLP)

            cells = [[jnp.where(swap, u[vy][vx], u[vx][vy])
                      for vy in range(V)] for vx in range(V)]

            # visibility flood on bit-packed view columns (skipped for
            # see_through_walls envs, minigrid_env.py:613-619)
            if see_through:
                visr = [jnp.full(a.shape, FULL, jnp.int32)] * V
            else:
                tcol = []
                for j in range(V):
                    col = jnp.zeros_like(a)
                    for vx in range(V):
                        c = cells[vx][j]
                        tt = c & 15
                        trans = ~(
                            (tt == C.WALL)
                            | ((tt == C.DOOR) & (((c >> 7) & 3) != C.OPEN))
                        )
                        col |= trans.astype(jnp.int32) << vx
                    tcol.append(col)
                seed = jnp.broadcast_to(jnp.int32(1 << hs), a.shape)
                visr = [None] * V
                for j in range(V - 1, -1, -1):
                    visr[j], seed = _row_pass_bits(seed, tcol[j], V, FULL)

            # encode + probe (carried overlay at the agent view cell)
            probe_step = jnp.zeros_like(a)
            for vx in range(V):
                for vy in range(V):
                    c = cells[vx][vy]
                    if vx == hs and vy == V - 1:
                        c = cr
                    val = (c & 15) + ((c >> 4) & 7) + ((c >> 7) & 3)
                    probe_step += jnp.where(((visr[vy] >> vx) & 1) == 1, val, 0)
            probe = probe + probe_step

            return grid, npx, npy, nd, cr, sc, term, rew, probe

        init = (
            grid_ref[:], px_ref[:], py_ref[:], pd_ref[:], cr_ref[:], sc_ref[:],
            jnp.zeros(px_ref.shape, bool),
            jnp.zeros(px_ref.shape, jnp.float32),
            jnp.zeros(px_ref.shape, jnp.int32),
        )
        grid, px, py, pd, cr, sc, term, rew, probe = jax.lax.fori_loop(
            0, T, body, init
        )
        ogrid_ref[:] = grid
        opx_ref[:] = px
        opy_ref[:] = py
        opd_ref[:] = pd
        ocr_ref[:] = cr
        osc_ref[:] = sc
        oterm_ref[:] = term.astype(jnp.int32)
        orew_ref[:] = rew
        oprobe_ref[:] = probe

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 5))
def _run(params: EnvParams, grid_p, scalars, cr_p, actions, interpret: bool):
    W, H, V = params.width, params.height, params.view_size
    N = W * H
    T, B = actions.shape
    B8 = B // LANE
    nb = B8 // SUB
    px, py, pd, sc = scalars

    def tile1(x):
        return x.astype(jnp.int32).reshape(B8, LANE)

    grid_t = grid_p.T.reshape(N, B8, LANE)          # (N, B8, 128)
    act_t = actions.astype(jnp.int32).reshape(T, B8, LANE)

    kernel = _make_kernel(W, H, V, params.max_steps, params.see_through_walls)
    scal_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pl.BlockSpec((N, SUB, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    act_spec = pl.BlockSpec((T, SUB, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32
    i32 = jnp.int32
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[act_spec, grid_spec] + [scal_spec] * 5,
        out_specs=[grid_spec] + [scal_spec] * 8,
        out_shape=[
            jax.ShapeDtypeStruct((N, B8, LANE), i32),
            jax.ShapeDtypeStruct((B8, LANE), i32),
            jax.ShapeDtypeStruct((B8, LANE), i32),
            jax.ShapeDtypeStruct((B8, LANE), i32),
            jax.ShapeDtypeStruct((B8, LANE), i32),
            jax.ShapeDtypeStruct((B8, LANE), i32),
            jax.ShapeDtypeStruct((B8, LANE), i32),
            jax.ShapeDtypeStruct((B8, LANE), f32),
            jax.ShapeDtypeStruct((B8, LANE), i32),
        ],
        interpret=interpret,
    )(act_t, grid_t, tile1(px), tile1(py), tile1(pd), tile1(cr_p), tile1(sc))
    g, px, py, pd, cr, sc, term, rew, probe = outs
    flat = lambda x: x.reshape(B)
    return (
        g.reshape(N, B).T,                           # (B, N) packed
        flat(px), flat(py), flat(pd), flat(cr), flat(sc),
        flat(term).astype(bool), flat(rew), flat(probe),
    )


def fused_rollout(env, state: EnvState, actions, *, interpret: bool = False):
    """Run ``T`` fused env steps over a batched state.

    Args:
      env: a core-dynamics environment (``supports_fused_rollout`` must hold).
      state: batched :class:`EnvState` (leading axis B, B % 1024 == 0).
      actions: (T, B) int32 action stream.

    Returns:
      (new_state, reward_sum (B,) f32, obs_probe (B,) i32) where ``obs_probe``
      is the per-env sum over steps of the (image-channel) observation values
      — the same quantity the XLA benchmark loop reduces, proving the
      observation pipeline ran for every transition.
    """
    params = env.params
    B = state.agent_pos.shape[0]
    assert supports_fused_rollout(env, B), "env/batch not fused-rollout capable"
    grid_p = G.pack_cells(state.grid).reshape(B, -1)
    cr_p = G.pack_cells(state.carrying)
    scalars = (state.agent_pos[:, 0], state.agent_pos[:, 1],
               state.agent_dir, state.step_count)
    g, px, py, pd, cr, sc, term, rew, probe = _run(
        params, grid_p, scalars, cr_p, actions, interpret
    )
    W, H = params.width, params.height
    new_grid = G.unpack_cells(g.reshape(B, W, H))
    new_state = state.replace(
        grid=new_grid,
        agent_pos=jnp.stack([px, py], axis=-1),
        agent_dir=pd,
        carrying=G.unpack_cells(cr),
        step_count=sc,
        terminated=term,
        truncated=sc >= params.max_steps,
    )
    return new_state, rew, probe

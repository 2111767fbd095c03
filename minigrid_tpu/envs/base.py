"""Functional environment base.

The reference couples dynamics to the Gymnasium class protocol
(``minigrid/minigrid_env.py:24``). Here an environment is a bundle of *pure
functions* closed over static params — the gymnax-style functional contract —
so ``reset``/``step`` compose freely with ``jit``/``vmap``/``pjit``:

    obs, state = env.reset(key)
    obs, state, reward, terminated, truncated, info = env.step(key, state, a)

Subclasses implement ``_gen_grid(key) -> EnvState`` (the analog of the
reference's abstract ``_gen_grid``, minigrid_env.py:236-238) and may override
``_pre_step`` / ``_post_step`` for custom dynamics or reward shaping (the
analog of per-env ``step`` overrides, e.g. envs/fetch.py:161-175).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.actions import NUM_ACTIONS
from minigrid_tpu.core.mission import tokenize
from minigrid_tpu.core.obs import gen_obs
from minigrid_tpu.core.step import step_core
from minigrid_tpu.core.types import MISSION_LEN, EnvParams, EnvState


def autoreset_step(env, key, state, action):
    """Generic auto-resetting step over any env-like (incl. wrappers).

    Exact semantics: a finishing episode is replaced by a *freshly generated*
    layout (a full ``env.reset``), so every reset is an independent draw —
    the distribution-parity reference path. The cost is that the layout
    generator runs for every env on every step (selected away when not
    done); for throughput-critical training loops use the pooled variant
    below, which replaces the per-step regeneration with a gather from a
    device-resident pool of pre-generated layouts.

    Works through the generic (obs, state) step/reset surface, so it
    composes with wrappers; the base-env override
    (:meth:`MiniGridEnv.step_autoreset`) additionally folds the two
    observation computations into one.
    """
    k_step, k_reset = jax.random.split(key)
    obs, st, reward, term, trunc, info = env.step(k_step, state, action)
    done = term | trunc
    obs_r, st_r = env.reset(k_reset)
    st = jax.tree.map(lambda a, b: jnp.where(done, b, a), st, st_r)
    obs = jax.tree.map(lambda a, b: jnp.where(done, b, a), obs, obs_r)
    return obs, st, reward, term, trunc, info


# ---------------------------------------------------------------------------
# Layout pool: device-resident pre-generated reset states for the training
# hot path. The pool is ONE flat (P, F) int32 buffer, not a stacked pytree:
# rows are bit-packed tight — grid/carrying cells to 16 bits via
# grid.pack_cells (every channel is vocabulary-bounded, core/constants.py),
# mission tokens to 16 bits (VOCAB < 2^16), bools/uint8 4-per-lane — so a
# DoorKey-8x8 state is one 128-lane tile (512 B), and deserialization is
# static slices + shifts that fuse into the step. The default consumption
# pattern is ONE dynamic-sliced row per step broadcast into every env that
# finished (see autoreset_step_pooled for why per-env gathers lose).
# ---------------------------------------------------------------------------

def _pair_pack(flat16):
    """(P, n) int32 with values < 2^16 -> (P, ceil(n/2)) int32."""
    P, n = flat16.shape
    if n % 2:
        flat16 = jnp.pad(flat16, ((0, 0), (0, 1)))
    v = flat16.reshape(P, -1, 2)
    return v[..., 0] | (v[..., 1] << 16)


def _pair_unpack(col, n):
    """(w,) int32 -> (n,) int32 of the packed 16-bit halves."""
    v = jnp.stack([col & 0xFFFF, (col >> 16) & 0xFFFF], axis=-1)
    return v.reshape(-1)[:n]


def _leaf_kind(name: str, x) -> str:
    from minigrid_tpu.core import constants as C

    dt = jnp.dtype(x.dtype)
    if (dt == jnp.dtype(jnp.uint8) and x.ndim >= 2
            and x.shape[-1] == C.NUM_CHANNELS
            and ("grid" in name or "carrying" in name)):
        return "cells"      # grid / carrying: 16-bit packed cells
        # (keyed on the path name too: a future uint8 extra field of
        # width NUM_CHANNELS must not be silently bit-truncated through
        # pack_cells — it serializes as plain u8 below)
    if name.endswith("mission") and dt == jnp.dtype(jnp.int32):
        return "u16"        # token ids < VOCAB_SIZE < 2^16
    if dt in (jnp.dtype(bool), jnp.dtype(jnp.uint8)):
        return "u8"
    if dt.itemsize == 4:
        return "w32"
    raise NotImplementedError(f"pool leaf dtype {dt} at {name}")


def _serialize_stacked(tree):
    """Stacked (P, ...) pytree -> ((P, F) int32 buffer, static spec)."""
    from minigrid_tpu.core import grid as G

    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    cols, entries = [], []
    for path, x in leaves:
        P = x.shape[0]
        shape = tuple(x.shape[1:])
        dt = jnp.dtype(x.dtype)
        kind = _leaf_kind(jax.tree_util.keystr(path), x)
        if kind == "cells":
            col = _pair_pack(G.pack_cells(x).reshape(P, -1))
        elif kind == "u16":
            col = _pair_pack(x.reshape(P, -1))
        elif kind == "u8":
            u8 = x.reshape(P, -1).astype(jnp.uint8)
            pad = (-u8.shape[1]) % 4
            if pad:
                u8 = jnp.pad(u8, ((0, 0), (0, pad)))
            col = jax.lax.bitcast_convert_type(
                u8.reshape(P, -1, 4), jnp.int32)
        else:
            flat = x.reshape(P, -1)
            col = (flat if dt == jnp.dtype(jnp.int32)
                   else jax.lax.bitcast_convert_type(flat, jnp.int32))
        cols.append(col)
        entries.append((shape, dt.name, col.shape[1], kind))
    buf = jnp.concatenate(cols, axis=1)
    pad = (-buf.shape[1]) % 128  # full lane tiles for the row gather
    if pad:
        buf = jnp.pad(buf, ((0, 0), (0, pad)))
    return buf, (treedef, tuple(entries))


def _deserialize_row(row, spec):
    """One (F,) int32 row -> the pytree of a single pool entry."""
    from minigrid_tpu.core import grid as G

    treedef, entries = spec
    leaves, off = [], 0
    for shape, dtname, width, kind in entries:
        col = jax.lax.slice_in_dim(row, off, off + width, axis=0)
        off += width
        dt = jnp.dtype(dtname)
        n = 1
        for s in shape:
            n *= s
        if kind == "cells":
            packed = _pair_unpack(col, n // 5)
            leaves.append(G.unpack_cells(packed).reshape(shape))
        elif kind == "u16":
            leaves.append(_pair_unpack(col, n).reshape(shape))
        elif kind == "u8":
            u8 = jax.lax.bitcast_convert_type(col, jnp.uint8).reshape(-1)[:n]
            leaves.append(u8.astype(dt).reshape(shape))
        else:
            leaf = (col if dt == jnp.dtype(jnp.int32)
                    else jax.lax.bitcast_convert_type(col, dt))
            leaves.append(leaf.reshape(shape))
    return jax.tree.unflatten(treedef, leaves)


@struct.dataclass
class LayoutPool:
    """Device-resident pool of P pre-generated reset *states*, serialized
    into one flat int32 buffer (see above). Observations are NOT pooled:
    the pooled step selects the state first and generates the observation
    once on the selected state, so the reset obs is always consistent with
    the reset state and costs nothing extra.

    Sampling a pool entry uniformly at reset time yields the correct
    *marginal* layout distribution (each entry is an independent ``reset``
    draw); entries are only reused within a pool generation, so refresh the
    pool off the hot path (every few train steps via
    :func:`refresh_layout_pool`) to restore independence across time.
    """

    buf: jax.Array                                   # (P, F) int32
    spec: Any = struct.field(pytree_node=False)      # static (treedef, entries)

    @property
    def size(self) -> int:
        return self.buf.shape[0]

    def entry(self, i) -> "EnvState":
        """Materialize pool entry ``i`` as an EnvState. Test/debug helper."""
        return _deserialize_row(self.buf[i], self.spec)


def make_layout_pool(env, key, pool_size: int = 1024) -> LayoutPool:
    """Generate a fresh pool of ``pool_size`` independent reset layouts.

    Jitted internally (memoized per env instance/pool size) so refreshes
    reuse the compiled generator instead of re-tracing."""
    # memo key includes params: replace_params() copies __dict__, so a
    # derived env (e.g. .packed()) must not inherit the stale builder
    memo_key = (pool_size, env.params)
    cached = getattr(env, "_pool_builder", None)
    if cached is None or cached[0] != memo_key:
        def build(k):
            states = jax.vmap(env._gen_grid)(jax.random.split(k, pool_size))
            buf, spec = _serialize_stacked(states)
            return LayoutPool(buf=buf, spec=spec)

        cached = (memo_key, jax.jit(build))
        env._pool_builder = cached
    return cached[1](key)


def refresh_layout_pool(env, key, pool: LayoutPool) -> LayoutPool:
    """Regenerate every pool entry (run this outside the rollout scan)."""
    return make_layout_pool(env, key, pool.size)


def presample_reset_states(key, pool: LayoutPool, length: int) -> "EnvState":
    """Draw ``length`` fresh broadcast reset states from the pool, stacked
    on a leading axis — ONE per upcoming rollout step. Feed as the scan's
    per-step xs to :func:`autoreset_step_presampled`: the row gather and
    the bit-unpacking then happen once per chunk outside the hot loop,
    leaving only the broadcast select inside it."""
    idx = jax.random.randint(key, (length,), 0, pool.size)
    rows = pool.buf[idx]
    return jax.vmap(_deserialize_row, in_axes=(0, None))(rows, pool.spec)


def draw_pool_row(keys, pool: LayoutPool) -> "EnvState":
    """The broadcast-row pool draw: ONE row for this step, salted off the
    first env's step key. The single source of the draw construction —
    wrapper fast paths that pre-draw the row (ActionBonus) call this so
    they can never drift from :func:`autoreset_step_pooled`'s reset
    distribution."""
    k_pool = jax.random.fold_in(keys[0], 0x9E3779B9)
    row_i = jax.random.randint(k_pool, (), 0, pool.size)
    row = jax.lax.dynamic_slice_in_dim(pool.buf, row_i, 1, axis=0)[0]
    return _deserialize_row(row, pool.spec)


def _apply_broadcast_reset(env, keys, st, done, st_r):
    """Shared tail of the pooled auto-reset: select the (broadcast) reset
    state into finished envs with fresh per-env episode RNG, then generate
    the observation once on the post-select state. The fresh RNG is a
    distinct constant XORed into each env's (already random) step key —
    an independent key stream under counter-based hashing without a
    per-env threefry pass."""
    from minigrid_tpu.core.obs import gen_obs

    bdone = lambda x: done.reshape((-1,) + (1,) * (x.ndim - 1))
    # NOTE: XOR-derived sibling keys are not jax's documented split/fold_in
    # construction; under counter-based threefry the XORed constant yields a
    # distinct counter stream, which is heuristically (not provably)
    # independent of the same-step dynamics stream. MEASURED (round 5, v5e,
    # B=4096 DoorKey-8x8): swapping in a vmapped fold_in costs 4.6% of the
    # pooled auto-reset rate (135.9 -> 129.7M steps/s) and 1.4% of the
    # fresh rate (125.7 -> 123.9M) — a real per-step batched threefry pass
    # — so XOR stays; the distribution guards in
    # tests/test_distribution.py cover the observable consequences.
    rng_r = keys ^ jnp.asarray([0x5DEECE66, 0xB5297A4D], keys.dtype)
    st_r = st_r.replace(rng=rng_r)  # batched rng; the rest broadcasts
    st = jax.tree.map(lambda a, b: jnp.where(bdone(a), b, a), st, st_r)
    return jax.vmap(lambda s: gen_obs(env.params, s))(st), st


def autoreset_step_presampled(env, keys, states, actions,
                              reset_state: "EnvState"):
    """BATCHED auto-resetting step whose broadcast reset state for THIS
    step was pre-deserialized outside the scan (see
    :func:`presample_reset_states`). Semantics identical to the default
    mode of :func:`autoreset_step_pooled`; this is the form the rollout
    drivers compile."""
    st, reward, term, trunc = jax.vmap(env.step_state)(keys, states, actions)
    obs, st = _apply_broadcast_reset(env, keys, st, term | trunc,
                                     reset_state)
    return obs, st, reward, term, trunc, {}


def autoreset_step_pooled(env, keys, states, actions, pool: LayoutPool,
                          independent: bool = False):
    """BATCHED auto-resetting step whose resets come from ``pool`` instead
    of a full per-env layout regeneration. ``keys``/``states``/``actions``
    carry a leading batch axis B; do NOT vmap this function.

    Default mode — broadcast row: each step draws ONE fresh pool row (a
    single-row dynamic slice) and every env finishing on that step restarts
    from it. Per-env marginals are exactly uniform over the pool (the row
    draw is independent of which envs finish), so layout statistics match
    ``reset()`` exactly; the only deviation from independent resets is that
    envs finishing on the *same* step share a layout. With B=4096 over a
    1024-entry pool, ~4 envs share any given layout anyway, so this raises
    within-batch layout correlation only modestly — and it is what keeps
    the reset path at full step throughput: every alternative that reads a
    DIFFERENT pool row per env (batched gather, compacted scatter, one-hot
    matmul reconstruction — all measured) pays either ~5 ns/row serialized
    DMA latency or full-batch layout-transpose copies, several times the
    cost of the transition itself.

    ``independent=True`` selects the dense per-env gather instead: every
    finishing env draws its own pool row (fully independent resets,
    ~3-4x slower at B=4096). Use it when per-step reset independence
    matters more than throughput.

    Either way the observation is generated ONCE on the post-reset state,
    and fresh per-env RNG is derived from this step's keys so envs sharing
    a pool entry still diverge in in-episode stochastic dynamics (e.g.
    DynamicObstacles).
    """
    from minigrid_tpu.core.obs import gen_obs

    st, reward, term, trunc = jax.vmap(env.step_state)(keys, states, actions)
    done = term | trunc
    bdone = lambda x: done.reshape((-1,) + (1,) * (x.ndim - 1))
    # fresh per-env episode RNG without a per-env threefry pass: a distinct
    # constant XORed into each env's (already random) step key yields an
    # independent key stream under counter-based hashing
    rng_r = keys ^ jnp.asarray([0x5DEECE66, 0xB5297A4D], keys.dtype)

    if independent:
        idx = jax.vmap(lambda k: jax.random.randint(k, (), 0, pool.size))(
            rng_r ^ jnp.asarray([0x68E31DA4, 0x1B56C4E9], keys.dtype))
        rows = pool.buf[idx]
        st_r = jax.vmap(_deserialize_row, in_axes=(0, None))(rows, pool.spec)
        st_r = st_r.replace(rng=rng_r)
        st = jax.tree.map(lambda a, b: jnp.where(bdone(a), b, a), st, st_r)
    else:
        st_r = draw_pool_row(keys, pool)  # UNBATCHED: broadcast in
        obs, st = _apply_broadcast_reset(env, keys, st, done, st_r)
        return obs, st, reward, term, trunc, {}
    obs = jax.vmap(lambda s: gen_obs(env.params, s))(st)
    return obs, st, reward, term, trunc, {}


# ---------------------------------------------------------------------------
# Fresh-buffer exact-distribution auto-reset: the double-buffered scheme.
# A chunk pre-generates N FRESH `_gen_grid` layouts (vmapped, inside the
# same compiled program — device cost ~0.05 us/layout; only a separate
# dispatch pays tunnel latency) and consumes them through a cursor: the
# r-th env finishing a step takes buffer row cursor+r, so every reset is an
# independent fresh draw consumed AT MOST ONCE — exact reference reset
# semantics (minigrid/minigrid_env.py:119-157) without the broadcast-row
# pooled path's same-step layout sharing, at ~pooled speed.
# ---------------------------------------------------------------------------

def presample_fresh_reset_states(env, key, n: int) -> "EnvState":
    """``n`` independent fresh layouts, stacked on a leading axis.

    Size ``n`` above the chunk's expected consumption: resets arrive at
    ~B/max_steps per step (staggered), so ``n >= steps * B/max_steps +
    4*sqrt(...)`` leaves overflow probability negligible; the consumer
    clamps its window at the buffer end as a last resort."""
    return jax.vmap(env._gen_grid)(jax.random.split(key, n))



def autoreset_step_fresh(env, keys, states, actions, buffer: "EnvState",
                         cursor, window: int = 32):
    """BATCHED auto-resetting step with exact reset distribution.

    ``buffer`` holds stacked fresh states (see
    :func:`presample_fresh_reset_states`); ``cursor`` (scalar int32) counts
    rows consumed so far this chunk. Envs finishing this step are ranked
    (cumsum of the done mask) and env with rank r restarts from buffer row
    ``cursor + r``; the cursor advances by the number of finishers, so no
    row is consumed twice. Routing reads a ``window``-row dynamic slice and
    mixes it into finished envs with a one-hot (B, window) contraction in
    f32 — exact for every state leaf (one nonzero term per row; integer
    leaves stay below 2^24) except ``rng``, which is instead refreshed from
    this step's keys like the other reset paths. ``window`` bounds
    same-step finishers: ranks beyond it share the last row (with
    staggered resets the finisher count is ~Poisson(B/max_steps); keep
    window >= 4x that mean). Returns ``(obs, state, reward, terminated,
    truncated, info, new_cursor)``.

    ``info["reset_overflow"]`` counts the finishers this step whose reset
    could NOT be an untouched fresh row: ranks clamped at ``window - 1``
    (a synchronized finish wave larger than the routing window) plus rows
    re-read because the cursor ran past ``n_buf - window`` (buffer
    exhausted — episodes ending much faster than the sizing assumed, e.g.
    a trained policy finishing in a fraction of ``max_steps``). Zero in
    correct operation; a nonzero count means those resets shared/reused
    layouts and the exact-distribution guarantee degraded — resize the
    buffer/window or stagger initial states. The PPO driver surfaces the
    rollout-summed count as the ``reset_overflow`` train metric.
    """
    st, reward, term, trunc = jax.vmap(env.step_state)(keys, states, actions)
    obs, st, info, cursor = _fresh_select(env, keys, st, term | trunc,
                                          buffer, cursor, window)
    return obs, st, reward, term, trunc, info, cursor


def _fresh_select(env, keys, st, done, buffer, cursor, window):
    """The routing/select/obs tail of :func:`autoreset_step_fresh`, split
    out so stateful wrapper fast paths (wrappers/ ActionBonus pattern) can
    run their per-env bookkeeping between the batched step and the reset
    select. Returns ``(obs, state, info, new_cursor)``."""
    from minigrid_tpu.core.obs import gen_obs

    n_buf = jax.tree.leaves(buffer)[0].shape[0]
    B = done.shape[0]
    rank = jnp.cumsum(done) - done  # exclusive rank among finishers
    slot = jnp.minimum(rank, window - 1)
    oh = ((slot[:, None] == jnp.arange(window)) & done[:, None]).astype(
        jnp.float32)
    start = jnp.minimum(cursor, n_buf - window)
    win = jax.tree.map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, start, window), buffer)

    bdone = lambda x: done.reshape((-1,) + (1,) * (x.ndim - 1))

    def route(leaf, cand):
        mixed = (oh @ cand.reshape(window, -1).astype(jnp.float32))
        mixed = mixed.reshape(B, *cand.shape[1:]).astype(leaf.dtype)
        return jnp.where(bdone(leaf), mixed, leaf)

    st = jax.tree.map(route, st, win)
    # fresh per-env episode RNG (rng routed above is f32-lossy garbage and
    # must not be kept): same construction as _apply_broadcast_reset
    rng_r = keys ^ jnp.asarray([0x5DEECE66, 0xB5297A4D], keys.dtype)
    st = st.replace(rng=jnp.where(done[:, None], rng_r, st.rng))
    obs = jax.vmap(lambda s: gen_obs(env.params, s))(st)
    # overflow accounting (see docstring): window-clamped ranks + rows the
    # start clamp re-read because the buffer ran out
    overrun_rows = jnp.maximum(cursor - (n_buf - window), 0)
    overflow = (done & ((rank >= window)
                        | (slot < overrun_rows))).sum()
    info = {"reset_overflow": overflow}
    return obs, st, info, cursor + done.sum()


def require_bare_env(env, what: str):
    """The batched fast-path FREE FUNCTIONS in this module run
    env.step_state/gen_obs directly, which on a wrapped env would silently
    resolve past the wrapper's transforms — fail loudly instead. Wrapped
    envs get the fast paths through the METHOD surface
    (Wrapper.step_autoreset_pooled/_presampled/_fresh apply the stateless
    observation chain after the base env's batched step)."""
    if not isinstance(env, MiniGridEnv):
        raise NotImplementedError(
            f"{what} operates on bare envs (got {type(env).__name__}); "
            "call the corresponding method on the wrapped env instead")


class MiniGridEnv:
    """Base functional env. Instances are static config only; all episode
    data lives in the :class:`EnvState` pytree."""

    name: str = "MiniGridEnv"
    reward_range = (0, 1)  # minigrid_env.py:61; DynamicObstacles overrides

    def __init__(self, params: EnvParams):
        self.params = params

    # -- static spaces ---------------------------------------------------
    @property
    def num_actions(self) -> int:
        return NUM_ACTIONS

    def obs_shape(self) -> dict:
        v = self.params.view_size
        if self.params.packed_obs:
            return {"packed": (v, v), "direction": (), "mission": (MISSION_LEN,)}
        return {"image": (v, v, 3), "direction": (), "mission": (MISSION_LEN,)}

    def packed(self) -> "MiniGridEnv":
        """Copy of this env emitting packed observations (EnvParams
        docstring, core/types.py) — the fast policy-consumable format."""
        return self.replace_params(packed_obs=True)

    # -- mission ---------------------------------------------------------
    def default_mission(self) -> str:
        return "get to the green goal square"

    def mission_tokens(self) -> jnp.ndarray:
        return jnp.asarray(tokenize(self.default_mission()))

    def mission_space(self):
        """The Gymnasium mission space (the reference passes one to every
        env constructor, e.g. minigrid/envs/doorkey.py:65); envs with
        placeholder missions override with their template space."""
        from minigrid_tpu.core.mission_space import ConstantMission, MissionSpace

        return MissionSpace(mission_func=ConstantMission(self.default_mission()))

    def mission_text(self, state_or_tokens) -> str:
        from minigrid_tpu.core.mission import detokenize

        tokens = getattr(state_or_tokens, "mission", state_or_tokens)
        return detokenize(np.asarray(tokens))

    # -- construction helpers -------------------------------------------
    def make_state(
        self,
        grid: jax.Array,
        agent_pos,
        agent_dir,
        rng: jax.Array,
        mission: jax.Array | None = None,
        extra=None,
    ) -> EnvState:
        return EnvState(
            grid=grid,
            agent_pos=jnp.asarray(agent_pos, jnp.int32),
            agent_dir=jnp.asarray(agent_dir, jnp.int32),
            carrying=jnp.asarray(C.EMPTY_CELL),
            step_count=jnp.zeros((), jnp.int32),
            terminated=jnp.zeros((), bool),
            truncated=jnp.zeros((), bool),
            mission=self.mission_tokens() if mission is None else mission,
            rng=rng,
            extra=extra,
        )

    # -- API -------------------------------------------------------------
    def _gen_grid(self, key: jax.Array) -> EnvState:
        raise NotImplementedError

    def reset(self, key: jax.Array):
        state = self._gen_grid(key)
        return gen_obs(self.params, state), state

    def reset_staggered(self, key: jax.Array):
        """Reset with a uniform random initial ``step_count`` offset.

        Desynchronizes episode ends across a batch so auto-reset work
        spreads evenly instead of arriving in batch-wide truncation waves
        (the standard batched-RL warmup trick: each slot's FIRST episode is
        shortened, every later one is full-length). Use this to initialize
        training batches — it is essential for the pooled broadcast-row
        auto-reset, where a synchronized wave would hand every env the
        same pool layout."""
        obs, state = self.reset(key)
        off = jax.random.randint(
            jax.random.fold_in(key, 0x57A66E7), (), 0, self.params.max_steps)
        return obs, state.replace(step_count=off)

    def _transform_action(self, state: EnvState, action):
        """Action remapping before the core transition (e.g. Memory maps
        pickup->toggle, envs/memory.py:153-154)."""
        return action

    def _pre_step(self, key, state: EnvState, action) -> EnvState:
        """Dynamics occurring before the agent transition (e.g. moving
        obstacles, envs/dynamicobstacles.py:136-159)."""
        return state

    def _post_step(self, prev: EnvState, state: EnvState, action, reward, terminated):
        """Env-specific reward/termination overrides. Returns
        (state, reward, terminated)."""
        return state, reward, terminated

    def step_state(self, key: jax.Array, state: EnvState, action):
        """The state transition alone — everything in :meth:`step` except
        observation generation. Returns (state, reward, term, trunc).
        The auto-reset paths use this to select the surviving state first
        and generate the observation exactly once."""
        prev = state
        action = self._transform_action(state, action)
        state = self._pre_step(key, state, action)
        new_state, reward, terminated = step_core(self.params, state, action)
        new_state, reward, terminated = self._post_step(
            prev, new_state, action, reward, terminated
        )
        new_state = new_state.replace(terminated=terminated)
        return new_state, reward, terminated, new_state.truncated

    def step(self, key: jax.Array, state: EnvState, action):
        new_state, reward, terminated, truncated = self.step_state(
            key, state, action)
        obs = gen_obs(self.params, new_state)
        return obs, new_state, reward, terminated, truncated, {}

    def step_autoreset(self, key: jax.Array, state: EnvState, action):
        """Step with episode auto-reset (the batched-RL convention): when the
        episode ends, the returned state/obs come from a fresh ``reset``
        while reward/terminated/truncated report the finishing step.

        Exact-distribution variant (fresh ``_gen_grid`` per reset); the obs
        is generated once on the post-select state rather than once per
        branch, which is identical output for a third less obs work."""
        k_step, k_reset = jax.random.split(key)
        st, reward, term, trunc = self.step_state(k_step, state, action)
        done = term | trunc
        st_r = self._gen_grid(k_reset)
        st = jax.tree.map(lambda a, b: jnp.where(done, b, a), st, st_r)
        return gen_obs(self.params, st), st, reward, term, trunc, {}

    def step_autoreset_pooled(self, keys, states: EnvState, actions,
                              pool: LayoutPool, independent: bool = False):
        """BATCHED auto-resetting step drawing resets from a
        device-resident :class:`LayoutPool` — the fast training-loop path.
        Takes batch-leading arguments; do NOT vmap (see
        :func:`autoreset_step_pooled` for the broadcast-row/independent
        trade-off)."""
        return autoreset_step_pooled(self, keys, states, actions, pool,
                                     independent)

    def step_autoreset_presampled(self, keys, states: EnvState, actions,
                                  reset_state: EnvState):
        """BATCHED pooled auto-reset whose broadcast reset state was
        pre-deserialized outside the scan (:func:`presample_reset_states`)."""
        return autoreset_step_presampled(self, keys, states, actions,
                                         reset_state)

    def step_autoreset_fresh(self, keys, states: EnvState, actions,
                             buffer: EnvState, cursor, window: int = 32):
        """BATCHED exact-distribution auto-reset from a fresh-layout buffer
        (:func:`autoreset_step_fresh`)."""
        return autoreset_step_fresh(self, keys, states, actions, buffer,
                                    cursor, window)

    def presample_fresh(self, key, n: int) -> EnvState:
        return presample_fresh_reset_states(self, key, n)

    def make_pool(self, key, pool_size: int = 1024) -> LayoutPool:
        return make_layout_pool(self, key, pool_size)

    # -- convenience -----------------------------------------------------
    def vector(self, n: int):
        """vmapped (reset, step) pair over a batch axis of size n."""
        reset = jax.vmap(self.reset)
        step = jax.vmap(self.step_autoreset)
        return reset, step

    def replace_params(self, **kw) -> "MiniGridEnv":
        env = object.__new__(type(self))
        env.__dict__.update(self.__dict__)
        # derived envs must not inherit compiled caches keyed on the
        # original instance (e.g. the layout-pool builder)
        env.__dict__.pop("_pool_builder", None)
        env.params = dataclasses.replace(self.params, **kw)
        return env

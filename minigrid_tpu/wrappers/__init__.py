"""Functional wrapper layer.

Re-design of the reference's 15 Gymnasium wrappers
(``minigrid/wrappers.py:15-882``) as composable env transforms over the
functional API. Observation transforms are pure functions of (obs, state);
wrappers that carry memory (seed cycling, visit counts, goal cache) put it in
a :class:`WrappedState` pytree so they stay jit/vmap-compatible — the count
dicts of the bonus wrappers (wrappers.py:104,171) become dense count arrays.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import mission as M
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.obs import gen_obs
from minigrid_tpu.core.step import front_cell
from minigrid_tpu.core.types import EnvState
from minigrid_tpu.envs.base import autoreset_step
from minigrid_tpu.render import get_frame


@struct.dataclass
class WrappedState:
    inner: Any
    wrapper: Any


def _inner_env_state(state) -> EnvState:
    while isinstance(state, WrappedState):
        state = state.inner
    return state


class Wrapper:
    """Base pass-through wrapper."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        if name == "env":  # not yet set (e.g. mid-copy) — don't recurse
            raise AttributeError(name)
        return getattr(self.env, name)

    def reset(self, key):
        return self.env.reset(key)

    def step(self, key, state, action):
        return self.env.step(key, state, action)

    def step_autoreset(self, key, state, action):
        return autoreset_step(self, key, state, action)

    def reset_staggered(self, key):
        """Wrapper-aware staggered reset (see MiniGridEnv.reset_staggered):
        runs THIS stack's reset (so wrapper state is initialized), then
        offsets the inner step_count. Without this override the attribute
        would delegate to the bare env and return an un-wrapped state."""
        obs, state = self.reset(key)
        off = jax.random.randint(
            jax.random.fold_in(key, 0x57A66E7), (), 0,
            self.params.max_steps)
        e = _inner_env_state(state)
        state = _replace_inner(state, e.replace(step_count=off))
        return obs, state

    def vector(self, n: int):
        return jax.vmap(self.reset), jax.vmap(self.step_autoreset)

    # -- batched fast paths ----------------------------------------------
    # The pooled / presampled / fresh auto-reset paths run batched on bare
    # EnvStates. Two wrapper classes keep bare states (no WrappedState)
    # and therefore ride them at full throughput:
    #
    #  - stateless ObservationWrappers: the base env steps batched, then
    #    the observation transforms apply outward;
    #  - memoryless TransitionWrappers (NoDeath, StochasticActionWrapper):
    #    pure per-env action pre-maps and outcome post-maps, composed INTO
    #    the batched ``step_state`` the reset-select paths vmap — so e.g.
    #    the standard NoDeath-on-lava training setup keeps pooled speed.
    #
    # Genuinely stateful wrappers thread per-env WrappedState through
    # resets: the bonuses and DirectionObs ride the fast paths through
    # _StatefulFastPath below (visit tables update with a dense one-hot
    # accumulate; DirectionObs re-derives its goal cache from the
    # post-select states). ReseedWrapper stays on the exact
    # step_autoreset path by design — it DICTATES reset layouts, which
    # contradicts pool/buffer-routed resets — and the chain walk fails
    # loudly for it instead of silently delegating past its transform.
    def _fast_plan(self):
        """(base_env, [obs wrappers, innermost first],
        [transition wrappers, outermost first]).

        Raises NotImplementedError if the stack contains a wrapper that is
        neither a stateless :class:`ObservationWrapper` nor a memoryless
        :class:`TransitionWrapper` (unless that wrapper overrides the fast
        paths itself, like :class:`ActionBonus`)."""
        obs_chain, trans_chain, env = [], [], self
        while isinstance(env, Wrapper):
            if isinstance(env, ObservationWrapper):
                obs_chain.append(env)
            elif isinstance(env, TransitionWrapper):
                trans_chain.append(env)
            else:
                raise NotImplementedError(
                    f"{type(env).__name__} carries per-env wrapper state; "
                    "the pooled/fresh fast paths compose stacks of "
                    "stateless ObservationWrappers and memoryless "
                    "TransitionWrappers only — use step_autoreset (exact "
                    "resets), or give the wrapper its own batched methods "
                    "(see ActionBonus)")
            env = env.env
        return env, obs_chain[::-1], trans_chain

    def _fast_base(self):
        """(env for the batched reset-select paths, obs chain). When the
        stack holds transition wrappers, the returned env is a copy of the
        base whose ``step_state`` composes their action/outcome transforms
        around the core transition — the vmapped form the pooled/fresh
        free functions consume."""
        base, obs_chain, trans = self._fast_plan()
        return _composed_step_env(base, trans), obs_chain

    def _apply_obs_chain(self, obs, states):
        _, chain, _ = self._fast_plan()
        for w in chain:
            obs = jax.vmap(w.observation)(obs, states)
        return obs

    def step_autoreset_pooled(self, keys, states, actions, pool,
                              independent: bool = False):
        base, _ = self._fast_base()
        obs, st, r, te, tr, i = base.step_autoreset_pooled(
            keys, states, actions, pool, independent)
        return self._apply_obs_chain(obs, st), st, r, te, tr, i

    def step_autoreset_presampled(self, keys, states, actions, reset_state):
        base, _ = self._fast_base()
        obs, st, r, te, tr, i = base.step_autoreset_presampled(
            keys, states, actions, reset_state)
        return self._apply_obs_chain(obs, st), st, r, te, tr, i

    def step_autoreset_fresh(self, keys, states, actions, buffer, cursor,
                             window: int = 32):
        base, _ = self._fast_base()
        obs, st, r, te, tr, i, cur = base.step_autoreset_fresh(
            keys, states, actions, buffer, cursor, window)
        return self._apply_obs_chain(obs, st), st, r, te, tr, i, cur

    def make_pool(self, key, pool_size: int = 1024):
        # plain base, not the composed copy: keeps the memoized pool
        # builder attached to the long-lived env instance
        base, _, _ = self._fast_plan()  # validates the stack
        return base.make_pool(key, pool_size)

    def presample_fresh(self, key, n: int):
        base, _, _ = self._fast_plan()
        return base.presample_fresh(key, n)

    def packed(self):
        """Rebuild this wrapper stack over a packed-observation inner env
        (EnvParams.packed_obs). Wrappers that transform the uint8 image
        fail loudly at trace time (no "image" key in packed observations);
        mission/direction transforms and :class:`ImgObsWrapper` compose."""
        import copy

        w = copy.copy(self)
        w.env = self.env.packed()
        return w

    def unwrapped(self):
        """The innermost bare environment."""
        env = self.env
        while isinstance(env, Wrapper):
            env = env.env
        return env


class ObservationWrapper(Wrapper):
    """Stateless observation transform; override :meth:`observation`."""

    def observation(self, obs, state):
        raise NotImplementedError

    def reset(self, key):
        obs, state = self.env.reset(key)
        return self.observation(obs, _inner_env_state(state)), state

    def step(self, key, state, action):
        obs, state, r, te, tr, i = self.env.step(key, state, action)
        return self.observation(obs, _inner_env_state(state)), state, r, te, tr, i


# distinct fold_in salts for the per-wrapper transform key streams so a
# transform's randomness never aliases the env step key it derives from
_TA_SALT = 0x7A11AC  # action pre-map stream
_TO_SALT = 0x0A71C0  # outcome post-map stream


class TransitionWrapper(Wrapper):
    """Memoryless per-env action/outcome transform over bare EnvStates.

    The shape behind the reference's action- and reward-transforming
    wrappers that carry no per-env memory (``StochasticActionWrapper``,
    ``NoDeath`` — minigrid/wrappers.py:785-882): a pure pre-map of the
    action plus a pure post-map of the transition outcome. Expressing them
    this way (instead of overriding ``step``) lets the batched
    pooled/presampled/fresh auto-reset paths compose the transforms
    straight into the vmapped ``step_state`` they already run — full
    fast-path throughput, no per-env Python dispatch.

    Override either hook; both default to identity:

    - ``transform_action(key, env_state, action) -> action`` runs before
      the core transition (on the pre-step state);
    - ``transform_outcome(key, prev_env_state, env_state, action, reward,
      term, trunc) -> (env_state, reward, term, trunc)`` runs after it,
      seeing the pre-step state, the post-step state, and the action this
      wrapper forwarded inward.

    In a stack, action pre-maps apply outermost-first and outcome
    post-maps innermost-first — exactly the order nested ``step`` calls
    produce.

    ``uses_rng`` (class attribute): set False when neither hook consumes
    its key — the fast path then skips the per-wrapper ``fold_in``, which
    is a full batched threefry pass per step (measured ~8 us/step at
    B=4096; NoDeath needs none).
    """

    uses_rng: bool = True

    def __init__(self, env):
        super().__init__(env)
        # per-layer key-stream index: the number of TransitionWrappers
        # BENEATH this one. Both the nested ``step`` path and the composed
        # fast path salt by it, so stacked rng-using transforms draw
        # DISTINCT keys and the two paths use the same stream per layer
        # (un-indexed salts made two stacked StochasticActionWrappers
        # repeat the same draw on the exact path).
        d, e = 0, env
        while isinstance(e, Wrapper):
            d += isinstance(e, TransitionWrapper)
            e = e.env
        self._t_depth = d

    def transform_action(self, key, env_state, action):
        return action

    def transform_outcome(self, key, prev_env_state, env_state, action,
                          reward, term, trunc):
        return env_state, reward, term, trunc

    def step(self, key, state, action):
        e_prev = _inner_env_state(state)
        k_a = (jax.random.fold_in(key, _TA_SALT + self._t_depth)
               if self.uses_rng else key)
        a = self.transform_action(k_a, e_prev,
                                  jnp.asarray(action, jnp.int32))
        obs, new_state, r, te, tr, i = self.env.step(key, state, a)
        e_new = _inner_env_state(new_state)
        k_o = (jax.random.fold_in(key, _TO_SALT + self._t_depth)
               if self.uses_rng else key)
        e2, r, te, tr = self.transform_outcome(k_o, e_prev, e_new, a, r,
                                               te, tr)
        if e2 is not e_new:
            new_state = _replace_inner(new_state, e2)
        return obs, new_state, r, te, tr, i


def _composed_step_env(base, trans_chain):
    """Copy of ``base`` whose ``step_state`` composes the transition
    wrappers' action/outcome transforms around the core transition (see
    :class:`TransitionWrapper`). The batched reset-select free functions
    (envs/base.py) vmap ``env.step_state``, so handing them this composed
    env runs the transforms inside the same fused step — the fast path
    for NoDeath / StochasticActionWrapper stacks."""
    if not trans_chain:
        return base

    def step_state(key, state, action):
        a = jnp.asarray(action, jnp.int32)
        fwd = []  # the action each wrapper forwarded inward
        for w in trans_chain:
            # salt by the wrapper's own stream index (see
            # TransitionWrapper.__init__) so this composed path draws the
            # same per-layer keys as the nested ``step`` path
            k = (jax.random.fold_in(key, _TA_SALT + w._t_depth)
                 if w.uses_rng else key)
            a = w.transform_action(k, state, a)
            fwd.append(a)
        st, r, te, tr = type(base).step_state(base, key, state, a)
        for i in reversed(range(len(trans_chain))):
            w = trans_chain[i]
            k = (jax.random.fold_in(key, _TO_SALT + w._t_depth)
                 if w.uses_rng else key)
            st, r, te, tr = w.transform_outcome(k, state, st, fwd[i],
                                                r, te, tr)
        return st, r, te, tr

    env = object.__new__(type(base))
    env.__dict__.update(base.__dict__)
    env.step_state = step_state  # instance attribute shadows the method
    return env


class ReseedWrapper(Wrapper):
    """Deterministic seed cycling on reset (wrappers.py:15-66). The incoming
    PRNG key is ignored; layout seeds come from the configured list, with the
    cycle index carried in the wrapper state for auto-reset."""

    def __init__(self, env, seeds=(0,), seed_idx=0):
        super().__init__(env)
        self.seed_keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
        self.seed_idx = seed_idx

    def reset(self, key, _idx=None):
        idx = jnp.asarray(self.seed_idx) if _idx is None else _idx
        obs, state = self.env.reset(self.seed_keys[idx])
        n = self.seed_keys.shape[0]
        return obs, WrappedState(inner=state, wrapper=(idx + 1) % n)

    def step(self, key, state, action):
        obs, inner, r, te, tr, i = self.env.step(key, state.inner, action)
        return obs, state.replace(inner=inner), r, te, tr, i

    def step_autoreset(self, key, state, action):
        obs, st, r, te, tr, i = self.step(key, state, action)
        done = te | tr
        obs_r, st_r = self.reset(key, _idx=state.wrapper)
        st = jax.tree.map(lambda a, b: jnp.where(done, b, a), st, st_r)
        obs = jax.tree.map(lambda a, b: jnp.where(done, b, a), obs, obs_r)
        return obs, st, r, te, tr, i


class _StatefulFastPath(Wrapper):
    """Machinery for OUTERMOST stateful wrappers that ride the batched
    pooled/presampled/fresh auto-reset paths by threading their
    WrappedState batch through them: the batch steps via the inner
    stack's composed ``step_state``, then three hooks place the
    wrapper's bookkeeping around the reset select:

    - ``_post_step(wrapper, st, r, actions) -> (r, wrapper')`` runs on
      the post-step PRE-select batch (bonuses record the visit of the
      step just taken and add the reward bonus here — the visit belongs
      to the finishing episode, and counts persist across resets);
    - ``_post_select(wrapper', st_selected) -> wrapper''`` runs on the
      post-select batch (DirectionObs re-derives its per-env goal cache
      from whatever layouts the reset routed in);
    - ``_augment_obs(obs, st_selected, wrapper'') -> obs`` applies any
      wrapper-state-dependent observation transform after the stateless
      inner observation chain.
    """

    def _fast_plan(self):
        if isinstance(self.env, _StatefulFastPath):
            # Method dispatch would silently delegate past the inner
            # wrapper's state handling (its override skips the base chain
            # walk's loud raise); stacked stateful wrappers stay on the
            # exact step_autoreset path.
            raise NotImplementedError(
                f"{type(self).__name__} wraps {type(self.env).__name__}: "
                "the batched fast paths support ONE stateful wrapper, "
                "outermost — use step_autoreset (exact resets) for "
                "stacked stateful wrappers")
        if not isinstance(self.env, Wrapper):
            return self.env, [], []
        return self.env._fast_plan()

    def _post_step(self, wrapper, st, r, actions):
        return r, wrapper

    def _post_select(self, wrapper, st):
        return wrapper

    def _augment_obs(self, obs, st, wrapper):
        return obs

    def _batched_step(self, keys, states, actions):
        if not isinstance(states, WrappedState):
            raise TypeError(
                f"{type(self).__name__} batched fast paths take the "
                "WrappedState batch from jax.vmap(wrapper.reset)")
        base, _, trans = self._fast_plan()
        step_env = _composed_step_env(base, trans)
        st, r, te, tr = jax.vmap(step_env.step_state)(
            keys, states.inner, actions)
        r, w = self._post_step(states.wrapper, st, r, actions)
        return base, st, r, te, tr, w

    def step_autoreset_presampled(self, keys, states, actions, reset_state):
        from minigrid_tpu.envs.base import _apply_broadcast_reset

        base, st, r, te, tr, w = self._batched_step(keys, states, actions)
        obs, st = _apply_broadcast_reset(base, keys, st, te | tr,
                                         reset_state)
        w = self._post_select(w, st)
        obs = self._augment_obs(self._apply_obs_chain(obs, st), st, w)
        return obs, WrappedState(inner=st, wrapper=w), r, te, tr, {}

    def step_autoreset_pooled(self, keys, states, actions, pool,
                              independent: bool = False):
        from minigrid_tpu.envs.base import draw_pool_row

        if independent:
            raise NotImplementedError(
                f"{type(self).__name__} fast path supports the "
                "broadcast-row pooled mode only")
        return self.step_autoreset_presampled(
            keys, states, actions, draw_pool_row(keys, pool))

    def step_autoreset_fresh(self, keys, states, actions, buffer, cursor,
                             window: int = 32):
        from minigrid_tpu.envs.base import _fresh_select

        base, st, r, te, tr, w = self._batched_step(keys, states, actions)
        obs, st, info, cursor = _fresh_select(base, keys, st, te | tr,
                                              buffer, cursor, window)
        w = self._post_select(w, st)
        obs = self._augment_obs(self._apply_obs_chain(obs, st), st, w)
        return (obs, WrappedState(inner=st, wrapper=w), r, te, tr,
                info, cursor)


class _CountBonus(_StatefulFastPath):
    """Shared exploration-bonus machinery: a dense per-env visit table in
    the WrappedState, ``scale / sqrt(N)`` added to the reward, counts
    persisting across auto-resets (the reference keeps them in an
    instance dict, wrappers.py:104/:164). Subclasses define the table
    shape (``_zero_counts``), the per-env visit index (``_visit_index``)
    and its batched one-hot (``_visit_onehot``).

    On the batched fast paths the table updates with a dense one-hot
    accumulate: per-row scatters serialize ~5 ns/row on TPU, while the
    dense add is one fused VPU pass over the B x table lanes."""

    scale = 1.0

    def _zero_counts(self):
        raise NotImplementedError

    def _visit_index(self, env_state, action):
        raise NotImplementedError

    def _visit_onehot(self, st, actions):
        raise NotImplementedError

    def reset(self, key, _counts=None):
        obs, state = self.env.reset(key)
        counts = self._zero_counts() if _counts is None else _counts
        return obs, WrappedState(inner=state, wrapper=counts)

    def step(self, key, state, action):
        obs, inner, r, te, tr, i = self.env.step(key, state.inner, action)
        e = _inner_env_state(inner)
        idx = self._visit_index(e, jnp.asarray(action, jnp.int32))
        counts = state.wrapper.at[idx].add(1)
        bonus = self.scale / jnp.sqrt(counts[idx].astype(jnp.float32))
        return (obs, state.replace(inner=inner, wrapper=counts), r + bonus,
                te, tr, i)

    def step_autoreset(self, key, state, action):
        # split as the generic autoreset_step does (envs/base.py): the
        # replacement layout must not be a deterministic function of the
        # key that drove this step's dynamics
        k_step, k_reset = jax.random.split(key)
        obs, st, r, te, tr, i = self.step(k_step, state, action)
        done = te | tr
        obs_r, st_r = self.reset(k_reset, _counts=st.wrapper)
        st = jax.tree.map(lambda a, b: jnp.where(done, b, a), st, st_r)
        obs = jax.tree.map(lambda a, b: jnp.where(done, b, a), obs, obs_r)
        return obs, st, r, te, tr, i

    def _post_step(self, counts, st, r, actions):
        oh = self._visit_onehot(st, jnp.asarray(actions, jnp.int32))
        counts = counts + oh.astype(jnp.int32)
        visits = jnp.where(oh, counts, 0).sum(
            axis=tuple(range(1, counts.ndim)))
        return r + self.scale / jnp.sqrt(visits.astype(jnp.float32)), counts


class ActionBonus(_CountBonus):
    """1/sqrt(N(s, a)) exploration bonus (wrappers.py:68-123); the (pos,
    dir, action) visit table is a dense (W, H, 4, 7) array. Like the
    reference's dict, counts persist across auto-resets."""

    def _zero_counts(self):
        p = self.env.params
        return jnp.zeros((p.width, p.height, 4, 7), jnp.int32)

    def _visit_index(self, e, action):
        return (e.agent_pos[0], e.agent_pos[1], e.agent_dir, action)

    def _visit_onehot(self, st, a):
        p = self.params
        return ((st.agent_pos[:, 0, None, None, None, None]
                 == jnp.arange(p.width)[:, None, None, None])
                & (st.agent_pos[:, 1, None, None, None, None]
                   == jnp.arange(p.height)[:, None, None])
                & (st.agent_dir[:, None, None, None, None]
                   == jnp.arange(4)[:, None])
                & (a[:, None, None, None, None] == jnp.arange(7)))


class PositionBonus(_CountBonus):
    """1/sqrt(N(pos)) bonus (wrappers.py:126-185). NOTE: the reference
    accepts a ``scale`` argument but hard-codes ``self.scale = 1``
    (wrappers.py:161) — behavior reproduced."""

    def __init__(self, env, scale=1):
        super().__init__(env)
        self.scale = 1  # reference wrappers.py:161 ignores the argument

    def _zero_counts(self):
        p = self.env.params
        return jnp.zeros((p.width, p.height), jnp.int32)

    def _visit_index(self, e, action):
        return (e.agent_pos[0], e.agent_pos[1])

    def _visit_onehot(self, st, a):
        p = self.params
        return ((st.agent_pos[:, 0, None, None]
                 == jnp.arange(p.width)[:, None])
                & (st.agent_pos[:, 1, None, None] == jnp.arange(p.height)))


class ImgObsWrapper(ObservationWrapper):
    """Image-only observation (wrappers.py:187-214). On a packed-obs env
    (the training fast path) the packed int32 view plays the image's role,
    so the array-only contract returns it."""

    def observation(self, obs, state):
        return obs["image"] if "image" in obs else obs["packed"]


class OneHotPartialObsWrapper(ObservationWrapper):
    """One-hot of type/color/state planes, 20 bits (wrappers.py:217-285)."""

    def observation(self, obs, state):
        img = obs["image"]
        t = jax.nn.one_hot(img[..., 0], C.NUM_OBJECTS, dtype=jnp.uint8)
        c = jax.nn.one_hot(img[..., 1], C.NUM_COLORS, dtype=jnp.uint8)
        s = jax.nn.one_hot(img[..., 2], 3, dtype=jnp.uint8)
        return {**obs, "image": jnp.concatenate([t, c, s], axis=-1)}


class RGBImgObsWrapper(ObservationWrapper):
    """Full-frame RGB image observation (wrappers.py:287-332)."""

    def __init__(self, env, tile_size=8, highlight=True):
        super().__init__(env)
        self.tile_size = tile_size
        self.highlight = highlight

    def observation(self, obs, state):
        img = get_frame(self.env.params, state, highlight=self.highlight,
                        tile_size=self.tile_size)
        return {**obs, "image": img}


class RGBImgPartialObsWrapper(ObservationWrapper):
    """POV RGB image observation (wrappers.py:334-381)."""

    def __init__(self, env, tile_size=8):
        super().__init__(env)
        self.tile_size = tile_size

    def observation(self, obs, state):
        img = get_frame(self.env.params, state, tile_size=self.tile_size,
                        agent_pov=True)
        return {**obs, "image": img}


class FullyObsWrapper(ObservationWrapper):
    """Full symbolic grid with the agent cell stamped in
    (wrappers.py:383-426)."""

    def observation(self, obs, state):
        grid = state.grid[..., :3]
        agent_cell = jnp.stack([
            jnp.asarray(C.AGENT, jnp.uint8),
            jnp.asarray(C.COLOR_TO_IDX["red"], jnp.uint8),
            state.agent_dir.astype(jnp.uint8),
        ])
        # coordinate blend, not a u8 scatter (core/grid.py onehot_set)
        here = ((jnp.arange(grid.shape[0])[:, None] == state.agent_pos[0])
                & (jnp.arange(grid.shape[1]) == state.agent_pos[1]))
        grid = jnp.where(here[..., None], agent_cell, grid)
        return {**obs, "image": grid}


class DictObservationSpaceWrapper(ObservationWrapper):
    """Mission as word indices (wrappers.py:429-553). Our native missions
    are already tokenized with the reference's vocabulary order (ids
    offset by 1, 0 = pad); this wrapper sizes the vector to
    ``max_words_in_mission``."""

    def __init__(self, env, max_words_in_mission=50):
        super().__init__(env)
        self.max_words = max_words_in_mission

    def observation(self, obs, state):
        m = obs["mission"]
        L = m.shape[-1]
        if L >= self.max_words:
            m = m[..., : self.max_words]
        else:
            m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, self.max_words - L)])
        return {**obs, "mission": m}


def _char_tables():
    """Per-vocab-word character one-hot blocks for FlatObsWrapper."""
    max_len = max(len(w) for w in M.WORDS) + 1  # + trailing space
    blocks = np.zeros((M.VOCAB_SIZE, max_len, 28), np.uint8)
    lens = np.zeros(M.VOCAB_SIZE, np.int32)
    for word, wid in M.WORD_TO_ID.items():
        for i, ch in enumerate(word):
            if "a" <= ch <= "z":
                ch_no = ord(ch) - ord("a")
            elif ch == ",":
                ch_no = 27
            else:
                raise ValueError(ch)
            blocks[wid, i, ch_no] = 1
        blocks[wid, len(word), 26] = 1  # space separator
        lens[wid] = len(word) + 1
    return jnp.asarray(blocks), jnp.asarray(lens), max_len


class FlatObsWrapper(ObservationWrapper):
    """Image + char-one-hot mission flattened (wrappers.py:556-625).

    Character encoding is reassembled from the mission tokens: each word
    contributes its letters plus a separator space; the trailing space of
    the final word is dropped to match the reference string encoding.
    """

    def __init__(self, env, maxStrLen=96):
        super().__init__(env)
        self.max_str_len = maxStrLen
        self.num_char_codes = 28
        self._blocks, self._lens, self._max_word = _char_tables()

    def observation(self, obs, state):
        tokens = obs["mission"]
        L = tokens.shape[0]
        out = jnp.zeros((self.max_str_len + self._max_word, 28), jnp.uint8)

        def body(i, carry):
            out, offset = carry
            tok = tokens[i]
            block = self._blocks[tok]
            cur = jax.lax.dynamic_slice(out, (offset, 0), block.shape)
            out = jax.lax.dynamic_update_slice(
                out, jnp.maximum(cur, block), (offset, 0))
            return out, offset + self._lens[tok]

        out, offset = jax.lax.fori_loop(0, L, body, (out, jnp.zeros((), jnp.int32)))
        # drop the trailing separator space of the last word — blend, not
        # a u8 scatter (core/grid.py onehot_set rationale)
        has_words = offset > 0
        clear = ((jnp.arange(out.shape[0])[:, None]
                  == jnp.maximum(offset - 1, 0))
                 & (jnp.arange(28) == 26) & has_words)
        out = jnp.where(clear, jnp.uint8(0), out)
        out = out[: self.max_str_len]
        img = obs["image"]
        return jnp.concatenate([img.reshape(-1), out.reshape(-1)])


class ViewSizeWrapper(ObservationWrapper):
    """Re-render the egocentric view at a custom size (wrappers.py:629-673)."""

    def __init__(self, env, agent_view_size=7):
        super().__init__(env)
        assert agent_view_size % 2 == 1 and agent_view_size >= 3
        import dataclasses

        self.view_params = dataclasses.replace(
            env.params, view_size=agent_view_size)

    def observation(self, obs, state):
        new_obs = gen_obs(self.view_params, state)
        return {**obs, "image": new_obs["image"]}


class DirectionObsWrapper(_StatefulFastPath):
    """Slope/angle to the goal (wrappers.py:676-726). The goal coordinate is
    captured at reset; the reference's (row, col) index arithmetic
    (wrappers.py:703-709) — which swaps x/y — is reproduced verbatim.

    Rides the batched fast paths by re-deriving the goal cache from the
    post-select states each step (``_post_select``): Goal objects never
    move within an episode (nothing can pick up or toggle a Goal), so
    the recompute — a B x W x H compare + argmax, noise next to the
    transition — is observably identical to capture-at-reset."""

    def __init__(self, env, type="slope"):
        super().__init__(env)
        self.type = type

    def _post_select(self, w, st):
        return jax.vmap(self._goal_position)(st)

    def _augment_obs(self, obs, st, w):
        return jax.vmap(self._augment)(obs, st, w)

    def _goal_position(self, state):
        # first goal in row-major list order: idx = j * W + i; the
        # reference then computes (idx // height, idx % width) = (j, i)
        is_goal = (state.grid[..., 0] == C.GOAL).T  # [j, i] order
        flat = is_goal.reshape(-1)
        idx = jnp.argmax(flat)
        H = state.grid.shape[1]
        W = state.grid.shape[0]
        return jnp.stack([idx // H, idx % W]).astype(jnp.int32)

    def _augment(self, obs, state, goal_pos):
        slope = (
            (goal_pos[1] - state.agent_pos[1]).astype(jnp.float32)
            / (goal_pos[0] - state.agent_pos[0]).astype(jnp.float32)
        )
        value = jnp.arctan(slope) if self.type == "angle" else slope
        return {**obs, "goal_direction": value}

    def reset(self, key):
        obs, state = self.env.reset(key)
        goal = self._goal_position(_inner_env_state(state))
        return (self._augment(obs, _inner_env_state(state), goal),
                WrappedState(inner=state, wrapper=goal))

    def step(self, key, state, action):
        obs, inner, r, te, tr, i = self.env.step(key, state.inner, action)
        obs = self._augment(obs, _inner_env_state(inner), state.wrapper)
        return obs, state.replace(inner=inner), r, te, tr, i


class SymbolicObsWrapper(ObservationWrapper):
    """(x, y, object id) planes over the full grid (wrappers.py:729-782);
    empty cells get id -1, the agent cell id 10, hence int32 output."""

    def observation(self, obs, state):
        t = state.grid[..., 0].astype(jnp.int32)
        objects = jnp.where(t == C.EMPTY, -1, t)
        W, H = objects.shape
        xs = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
        ys = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1)
        img = jnp.stack([xs, ys, objects], axis=-1)
        img = img.at[state.agent_pos[0], state.agent_pos[1], 2].set(C.AGENT)
        return {**obs, "image": img}


class StochasticActionWrapper(TransitionWrapper):
    """Execute the intended action with probability ``prob``, else a random
    one (wrappers.py:785-806; the reference draws replacements from
    integers(0, 6), i.e. excluding ``done``). Memoryless action pre-map,
    so it rides the batched pooled/presampled/fresh fast paths."""

    def __init__(self, env, prob=0.9, random_action=None):
        super().__init__(env)
        self.prob = prob
        self.random_action = random_action

    def transform_action(self, key, env_state, action):
        k_choice, k_rand = jax.random.split(key)
        if self.random_action is None:
            replacement = jax.random.randint(k_rand, (), 0, 6)
        else:
            replacement = jnp.asarray(self.random_action)
        keep = jax.random.uniform(k_choice) < self.prob
        return jnp.where(keep, jnp.asarray(action), replacement)


class NoDeath(TransitionWrapper):
    """Replace deadly termination with a penalty (wrappers.py:809-882).
    Memoryless outcome post-map — the standard NoDeath-on-lava training
    setup keeps full pooled/fresh fast-path throughput."""

    uses_rng = False  # pure predicate: skip the per-step key folds

    def __init__(self, env, no_death_types: tuple[str, ...],
                 death_cost: float = -1.0):
        assert "goal" not in no_death_types
        super().__init__(env)
        self.death_types = jnp.asarray(
            [C.OBJECT_TO_IDX[t] for t in no_death_types], jnp.int32)
        self.death_cost = death_cost

    def transform_outcome(self, key, prev, st, action, r, te, tr):
        # read the front cell through the core transition's own helper so
        # this check can never drift from what step_core actually sees
        _, _, _, fwd_cell = front_cell(self.params, prev)
        ftype = fwd_cell[0].astype(jnp.int32)
        going_to_death = (
            (jnp.asarray(action) == Actions.forward)
            & (ftype != C.EMPTY)
            & (self.death_types == ftype).any()
        )
        # dense one-hot read of the agent's cell type: a per-env
        # st.grid[x, y] gather serializes ~5 ns/row under vmap
        here = ((jnp.arange(st.grid.shape[0])[:, None] == st.agent_pos[0])
                & (jnp.arange(st.grid.shape[1]) == st.agent_pos[1]))
        cur = jnp.where(here, st.grid[..., 0], 0).sum().astype(jnp.int32)
        in_death = (cur != C.EMPTY) & (self.death_types == cur).any()

        cancel = te & (going_to_death | in_death)
        r = jnp.where(cancel, r + self.death_cost, r)
        te = te & ~cancel
        # keep the state steppable after a canceled termination
        st = st.replace(terminated=st.terminated & ~cancel)
        return st, r, te, tr


def _replace_inner(state, new_env_state):
    if isinstance(state, WrappedState):
        return state.replace(inner=_replace_inner(state.inner, new_env_state))
    return new_env_state


__all__ = [
    "Wrapper", "ObservationWrapper", "TransitionWrapper", "WrappedState",
    "ReseedWrapper",
    "ActionBonus", "PositionBonus", "ImgObsWrapper",
    "OneHotPartialObsWrapper", "RGBImgObsWrapper", "RGBImgPartialObsWrapper",
    "FullyObsWrapper", "DictObservationSpaceWrapper", "FlatObsWrapper",
    "ViewSizeWrapper", "DirectionObsWrapper", "SymbolicObsWrapper",
    "StochasticActionWrapper", "NoDeath",
]

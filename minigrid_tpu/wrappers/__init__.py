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

    def vector(self, n: int):
        return jax.vmap(self.reset), jax.vmap(self.step_autoreset)

    # -- batched fast paths ----------------------------------------------
    # The pooled / presampled / fresh auto-reset paths run batched on bare
    # EnvStates. A stack made ONLY of stateless ObservationWrappers keeps
    # bare states (no WrappedState), so the fast path is: run the base
    # env's batched step, then apply the observation transforms outward —
    # full pooled throughput with wrapped observations. Stateful wrappers
    # (bonuses, Reseed, DirectionObs, ...) thread per-env WrappedState
    # through resets and stay on the exact step_autoreset path; the chain
    # walk below fails loudly for them instead of silently delegating to
    # the inner env and emitting un-wrapped observations.
    def _stateless_chain(self):
        """(base_env, [observation wrappers, innermost first]).

        Raises NotImplementedError if any wrapper in the stack is not a
        stateless :class:`ObservationWrapper`."""
        chain, env = [], self
        while isinstance(env, Wrapper):
            if not isinstance(env, ObservationWrapper):
                raise NotImplementedError(
                    f"{type(env).__name__} carries per-env wrapper state or "
                    "transforms actions/rewards; the pooled/fresh fast "
                    "paths support stacks of stateless ObservationWrappers "
                    "only — use step_autoreset (exact resets) instead")
            chain.append(env)
            env = env.env
        return env, chain[::-1]

    def _apply_obs_chain(self, obs, states):
        _, chain = self._stateless_chain()
        for w in chain:
            obs = jax.vmap(w.observation)(obs, states)
        return obs

    def step_autoreset_pooled(self, keys, states, actions, pool,
                              independent: bool = False):
        base, _ = self._stateless_chain()
        obs, st, r, te, tr, i = base.step_autoreset_pooled(
            keys, states, actions, pool, independent)
        return self._apply_obs_chain(obs, st), st, r, te, tr, i

    def step_autoreset_presampled(self, keys, states, actions, reset_state):
        base, _ = self._stateless_chain()
        obs, st, r, te, tr, i = base.step_autoreset_presampled(
            keys, states, actions, reset_state)
        return self._apply_obs_chain(obs, st), st, r, te, tr, i

    def step_autoreset_fresh(self, keys, states, actions, buffer, cursor,
                             window: int = 32):
        base, _ = self._stateless_chain()
        obs, st, r, te, tr, i, cur = base.step_autoreset_fresh(
            keys, states, actions, buffer, cursor, window)
        return self._apply_obs_chain(obs, st), st, r, te, tr, i, cur

    def make_pool(self, key, pool_size: int = 1024):
        base, _ = self._stateless_chain()  # validates the stack
        return base.make_pool(key, pool_size)

    def presample_fresh(self, key, n: int):
        base, _ = self._stateless_chain()
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


class ActionBonus(Wrapper):
    """1/sqrt(N(s, a)) exploration bonus (wrappers.py:68-123); the (pos,
    dir, action) visit table is a dense (W, H, 4, 7) array. Like the
    reference's dict, counts persist across auto-resets."""

    def __init__(self, env):
        super().__init__(env)

    def _zero_counts(self):
        p = self.env.params
        return jnp.zeros((p.width, p.height, 4, 7), jnp.int32)

    def reset(self, key, _counts=None):
        obs, state = self.env.reset(key)
        counts = self._zero_counts() if _counts is None else _counts
        return obs, WrappedState(inner=state, wrapper=counts)

    def step(self, key, state, action):
        obs, inner, r, te, tr, i = self.env.step(key, state.inner, action)
        e = _inner_env_state(inner)
        idx = (e.agent_pos[0], e.agent_pos[1], e.agent_dir,
               jnp.asarray(action, jnp.int32))
        counts = state.wrapper.at[idx].add(1)
        bonus = 1.0 / jnp.sqrt(counts[idx].astype(jnp.float32))
        return obs, state.replace(inner=inner, wrapper=counts), r + bonus, te, tr, i

    def step_autoreset(self, key, state, action):
        obs, st, r, te, tr, i = self.step(key, state, action)
        done = te | tr
        obs_r, st_r = self.reset(key, _counts=st.wrapper)
        st = jax.tree.map(lambda a, b: jnp.where(done, b, a), st, st_r)
        obs = jax.tree.map(lambda a, b: jnp.where(done, b, a), obs, obs_r)
        return obs, st, r, te, tr, i


class PositionBonus(Wrapper):
    """1/sqrt(N(pos)) bonus (wrappers.py:126-185). NOTE: the reference
    accepts a ``scale`` argument but hard-codes ``self.scale = 1``
    (wrappers.py:161) — behavior reproduced."""

    def __init__(self, env, scale=1):
        super().__init__(env)
        self.scale = 1  # reference wrappers.py:161 ignores the argument

    def reset(self, key, _counts=None):
        obs, state = self.env.reset(key)
        p = self.env.params
        counts = (jnp.zeros((p.width, p.height), jnp.int32)
                  if _counts is None else _counts)
        return obs, WrappedState(inner=state, wrapper=counts)

    def step(self, key, state, action):
        obs, inner, r, te, tr, i = self.env.step(key, state.inner, action)
        e = _inner_env_state(inner)
        idx = (e.agent_pos[0], e.agent_pos[1])
        counts = state.wrapper.at[idx].add(1)
        bonus = 1.0 / jnp.sqrt(counts[idx].astype(jnp.float32))
        return (obs, state.replace(inner=inner, wrapper=counts),
                r + bonus * self.scale, te, tr, i)

    def step_autoreset(self, key, state, action):
        obs, st, r, te, tr, i = self.step(key, state, action)
        done = te | tr
        obs_r, st_r = self.reset(key, _counts=st.wrapper)
        st = jax.tree.map(lambda a, b: jnp.where(done, b, a), st, st_r)
        obs = jax.tree.map(lambda a, b: jnp.where(done, b, a), obs, obs_r)
        return obs, st, r, te, tr, i


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
        grid = grid.at[state.agent_pos[0], state.agent_pos[1]].set(agent_cell)
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
        # drop the trailing separator space of the last word
        has_words = offset > 0
        out = out.at[jnp.maximum(offset - 1, 0), 26].set(
            jnp.where(has_words, 0, out[jnp.maximum(offset - 1, 0), 26])
        )
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


class DirectionObsWrapper(Wrapper):
    """Slope/angle to the goal (wrappers.py:676-726). The goal coordinate is
    captured at reset; the reference's (row, col) index arithmetic
    (wrappers.py:703-709) — which swaps x/y — is reproduced verbatim."""

    def __init__(self, env, type="slope"):
        super().__init__(env)
        self.type = type

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


class StochasticActionWrapper(Wrapper):
    """Execute the intended action with probability ``prob``, else a random
    one (wrappers.py:785-806; the reference draws replacements from
    integers(0, 6), i.e. excluding ``done``)."""

    def __init__(self, env, prob=0.9, random_action=None):
        super().__init__(env)
        self.prob = prob
        self.random_action = random_action

    def step(self, key, state, action):
        k_choice, k_rand, k_step = jax.random.split(key, 3)
        if self.random_action is None:
            replacement = jax.random.randint(k_rand, (), 0, 6)
        else:
            replacement = jnp.asarray(self.random_action)
        keep = jax.random.uniform(k_choice) < self.prob
        action = jnp.where(keep, jnp.asarray(action), replacement)
        return self.env.step(k_step, state, action)


class NoDeath(Wrapper):
    """Replace deadly termination with a penalty (wrappers.py:809-882)."""

    def __init__(self, env, no_death_types: tuple[str, ...],
                 death_cost: float = -1.0):
        assert "goal" not in no_death_types
        super().__init__(env)
        self.death_types = jnp.asarray(
            [C.OBJECT_TO_IDX[t] for t in no_death_types], jnp.int32)
        self.death_cost = death_cost

    def step(self, key, state, action):
        e_prev = _inner_env_state(state)
        # read the front cell through the core transition's own helper so
        # this check can never drift from what step_core actually sees
        _, _, _, fwd_cell = front_cell(self.env.params, e_prev)
        ftype = fwd_cell[0].astype(jnp.int32)
        going_to_death = (
            (jnp.asarray(action) == Actions.forward)
            & (ftype != C.EMPTY)
            & (self.death_types == ftype).any()
        )

        obs, new_state, r, te, tr, i = self.env.step(key, state, action)
        e = _inner_env_state(new_state)
        cur = e.grid[e.agent_pos[0], e.agent_pos[1], 0].astype(jnp.int32)
        in_death = (cur != C.EMPTY) & (self.death_types == cur).any()

        cancel = te & (going_to_death | in_death)
        r = jnp.where(cancel, r + self.death_cost, r)
        te = te & ~cancel
        # keep the inner state steppable after a canceled termination
        if isinstance(e, EnvState):
            new_state = _replace_inner(new_state, e.replace(
                terminated=e.terminated & ~cancel))
        return obs, new_state, r, te, tr, i


def _replace_inner(state, new_env_state):
    if isinstance(state, WrappedState):
        return state.replace(inner=_replace_inner(state.inner, new_env_state))
    return new_env_state


__all__ = [
    "Wrapper", "ObservationWrapper", "WrappedState", "ReseedWrapper",
    "ActionBonus", "PositionBonus", "ImgObsWrapper",
    "OneHotPartialObsWrapper", "RGBImgObsWrapper", "RGBImgPartialObsWrapper",
    "FullyObsWrapper", "DictObservationSpaceWrapper", "FlatObsWrapper",
    "ViewSizeWrapper", "DirectionObsWrapper", "SymbolicObsWrapper",
    "StochasticActionWrapper", "NoDeath",
]

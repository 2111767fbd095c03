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
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.actions import NUM_ACTIONS
from minigrid_tpu.core.mission import tokenize
from minigrid_tpu.core.obs import gen_obs
from minigrid_tpu.core.step import step_core
from minigrid_tpu.core.types import MISSION_LEN, EnvParams, EnvState


def autoreset_step(env, key, state, action):
    """Generic auto-resetting step over any env-like (incl. wrappers)."""
    k_step, k_reset = jax.random.split(key)
    obs, st, reward, term, trunc, info = env.step(k_step, state, action)
    done = term | trunc
    obs_r, st_r = env.reset(k_reset)
    st = jax.tree.map(lambda a, b: jnp.where(done, b, a), st, st_r)
    obs = jax.tree.map(lambda a, b: jnp.where(done, b, a), obs, obs_r)
    return obs, st, reward, term, trunc, info


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
        return {"image": (v, v, 3), "direction": (), "mission": (MISSION_LEN,)}

    # -- mission ---------------------------------------------------------
    def default_mission(self) -> str:
        return "get to the green goal square"

    def mission_tokens(self) -> jnp.ndarray:
        return jnp.asarray(tokenize(self.default_mission()))

    def mission_space(self):
        """The Gymnasium mission space (the reference passes one to every
        env constructor, e.g. minigrid/envs/doorkey.py:65); envs with
        placeholder missions override with their template space."""
        from minigrid_tpu.core.mission_space import MissionSpace

        return MissionSpace(mission_func=lambda m=self.default_mission(): m)

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

    def step(self, key: jax.Array, state: EnvState, action):
        prev = state
        action = self._transform_action(state, action)
        state = self._pre_step(key, state, action)
        new_state, reward, terminated = step_core(self.params, state, action)
        new_state, reward, terminated = self._post_step(
            prev, new_state, action, reward, terminated
        )
        new_state = new_state.replace(terminated=terminated)
        obs = gen_obs(self.params, new_state)
        return obs, new_state, reward, terminated, new_state.truncated, {}

    def step_autoreset(self, key: jax.Array, state: EnvState, action):
        """Step with episode auto-reset (the batched-RL convention): when the
        episode ends, the returned state/obs come from a fresh ``reset``
        while reward/terminated/truncated report the finishing step."""
        return autoreset_step(self, key, state, action)

    # -- convenience -----------------------------------------------------
    def vector(self, n: int):
        """vmapped (reset, step) pair over a batch axis of size n."""
        reset = jax.vmap(self.reset)
        step = jax.vmap(self.step_autoreset)
        return reset, step

    def replace_params(self, **kw) -> "MiniGridEnv":
        env = object.__new__(type(self))
        env.__dict__.update(self.__dict__)
        env.params = dataclasses.replace(self.params, **kw)
        return env

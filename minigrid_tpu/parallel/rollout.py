"""Device-resident rollout driver.

The env↔learner pipeline of SURVEY.md §5/§7: batched envs live on device,
rollouts run as ``lax.scan`` chunks (no host round trips), and under a mesh
the batch axis shards over ``data`` so env throughput scales linearly with
chips — environments never communicate; collectives appear only in the
learner's gradient reduction.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class RolloutChunk(NamedTuple):
    obs: Any
    action: jax.Array
    reward: jax.Array
    done: jax.Array


def make_rollout(env, policy_fn: Callable | None = None, length: int = 128,
                 pooled: bool = False):
    """Build rollout(params, env_state, obs, key[, pool]) -> (env_state,
    obs, key, RolloutChunk). With ``policy_fn=None``, acts uniformly at
    random. With ``pooled=True`` episode resets gather from a
    :class:`~minigrid_tpu.envs.base.LayoutPool` passed as the trailing
    argument (the fast training-loop path; see envs/base.py)."""

    if pooled:
        from minigrid_tpu.envs.base import presample_reset_states
        from minigrid_tpu.wrappers import Wrapper

        if isinstance(env, Wrapper):
            env._stateless_chain()  # raises for stateful wrapper stacks
    else:
        step = jax.vmap(env.step_autoreset)

    def rollout(params, env_state, obs, key, pool=None):
        def body(carry, st_r):
            env_state, obs, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            batch = jax.tree.leaves(obs)[0].shape[0]
            if policy_fn is None:
                action = jax.random.randint(k_act, (batch,), 0, 7)
            else:
                logits = policy_fn(params, obs)
                action = jax.random.categorical(k_act, logits)
            keys = jax.random.split(k_step, batch)
            if pooled:
                obs2, env_state2, reward, term, trunc, _ = \
                    env.step_autoreset_presampled(keys, env_state, action,
                                                  st_r)
            else:
                obs2, env_state2, reward, term, trunc, _ = step(
                    keys, env_state, action)
            return (env_state2, obs2, key), RolloutChunk(
                obs, action, reward, term | trunc)

        if pooled:
            key, k_pre = jax.random.split(key)
            xs = presample_reset_states(k_pre, pool, length)
        else:
            xs = None
        (env_state, obs, key), chunk = jax.lax.scan(
            body, (env_state, obs, key), xs, length=length)
        return env_state, obs, key, chunk

    return rollout

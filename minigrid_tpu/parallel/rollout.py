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
                 pooled: bool = False, resets: str | None = None,
                 fresh_buffer: int | None = None):
    """Build rollout(params, env_state, obs, key[, pool]) -> (env_state,
    obs, key, RolloutChunk). With ``policy_fn=None``, acts uniformly at
    random. Reset modes mirror ``models/ppo.py make_train_step``:
    ``"regen"`` (default), ``"pooled"`` (LayoutPool passed as the trailing
    argument), or ``"fresh"`` (exact-distribution resets from an in-call
    buffer of independent layouts; ``fresh_buffer`` sizes it — required
    for dynamic-budget envs)."""

    if resets is None:
        resets = "pooled" if pooled else "regen"
    assert resets in ("regen", "pooled", "fresh"), resets
    pooled = resets == "pooled"

    if resets in ("pooled", "fresh"):
        from minigrid_tpu.envs.base import presample_reset_states
        from minigrid_tpu.wrappers import Wrapper

        if isinstance(env, Wrapper):
            env._fast_plan()  # raises for unsupported stateful stacks
    else:
        step = jax.vmap(env.step_autoreset)
    fresh_window = 32
    if resets == "fresh" and fresh_buffer is None:
        ms = int(env.params.max_steps)
        if ms > 1 << 16:
            raise ValueError(
                "resets='fresh' on a dynamic-budget env: pass fresh_buffer")
        # per-env batch size is unknown until call time; sized in rollout

    def rollout(params, env_state, obs, key, pool=None):
        B = jax.tree.leaves(obs)[0].shape[0]
        if resets == "fresh":
            n_buf = fresh_buffer
            if n_buf is None:
                mean = B * length / int(env.params.max_steps)
                n_buf = int(mean * 1.2) + 8 * int(mean ** 0.5) + 64
            mean_step = n_buf / max(length, 1)
            window = max(fresh_window,
                         int(2 * mean_step + 6 * mean_step ** 0.5) + 1)
            window = min(window, n_buf)  # never slice past the buffer
            key, k_buf = jax.random.split(key)
            buffer = env.presample_fresh(k_buf, n_buf)

        def body(carry, st_r):
            env_state, obs, key, cursor = carry
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
            elif resets == "fresh":
                obs2, env_state2, reward, term, trunc, _, cursor = \
                    env.step_autoreset_fresh(keys, env_state, action,
                                             buffer, cursor, window=window)
            else:
                obs2, env_state2, reward, term, trunc, _ = step(
                    keys, env_state, action)
            return (env_state2, obs2, key, cursor), RolloutChunk(
                obs, action, reward, term | trunc)

        if pooled:
            key, k_pre = jax.random.split(key)
            xs = presample_reset_states(k_pre, pool, length)
        else:
            xs = None
        (env_state, obs, key, _), chunk = jax.lax.scan(
            body, (env_state, obs, key, jnp.zeros((), jnp.int32)), xs,
            length=length)
        return env_state, obs, key, chunk

    return rollout

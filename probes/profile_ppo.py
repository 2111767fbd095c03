"""Profile the full PPO train step on the chip: phase timing + op table.

Times rollout-only vs full train step (the delta is the update phase),
then traces one full step and aggregates op durations from the profile.

Usage:  python -u probes/profile_ppo.py [--trace] > /tmp/ppo_prof.txt
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core.obs import gen_obs
from minigrid_tpu.envs.base import LayoutPool, _serialize_stacked
from minigrid_tpu.models.actor_critic import ActorCritic, init_params
from minigrid_tpu.models.ppo import PPOConfig, make_optimizer, make_train_step

BATCH = 4096
POOL_SIZE = 1024
ROLLOUT = 128


def main():
    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0").packed()
    gen = jax.jit(jax.vmap(env._gen_grid))
    states = gen(jax.random.split(jax.random.PRNGKey(0), BATCH))
    jax.block_until_ready(states.grid)
    print("layouts generated", flush=True)
    pool_states = jax.tree.map(lambda x: x[:POOL_SIZE], states)
    pool = jax.jit(lambda t: LayoutPool(*_serialize_stacked(t)))(pool_states)
    offs = jax.random.randint(jax.random.PRNGKey(3), (BATCH,), 0,
                              env.params.max_steps)
    states = states.replace(step_count=offs)
    obs = jax.jit(jax.vmap(lambda s: gen_obs(env.params, s)))(states)

    cfg = PPOConfig(num_envs=BATCH, rollout_len=ROLLOUT)
    model = ActorCritic()
    opt = make_optimizer(cfg)
    params = init_params(jax.random.PRNGKey(0), model=model, packed=True)
    opt_state = opt.init(params)

    train_step = jax.jit(make_train_step(env, model, cfg, opt, pooled=True))
    key = jax.random.PRNGKey(2)
    out = train_step(params, opt_state, states, obs, key, pool)
    jax.block_until_ready(out[5]["loss"])
    print("train_step compiled", flush=True)
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        out = train_step(params, opt_state, states, obs, key, pool)
    jax.block_until_ready(out[5]["loss"])
    dt = (time.perf_counter() - t0) / N
    print(f"train_step: {dt*1e3:.2f} ms  ->"
          f" {BATCH*ROLLOUT/dt/1e6:.2f}M env-steps/s", flush=True)

    # rollout-only timing: rebuild just the rollout phase and jit it
    from minigrid_tpu.envs.base import (autoreset_step_presampled,
                                        presample_reset_states)

    def rollout_only(params, env_state, obs, key, pool):
        def body(carry, st_r):
            env_state, obs, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            logits, value = model.apply(params, obs)
            action = jax.random.categorical(k_act, logits)
            log_prob = jax.nn.log_softmax(logits)[
                jnp.arange(action.shape[0]), action]
            keys = jax.random.split(k_step, action.shape[0])
            obs2, env_state2, reward, term, trunc, _ = \
                autoreset_step_presampled(env, keys, env_state, action, st_r)
            return (env_state2, obs2, key), (action, log_prob, value, reward)

        key, k_pre = jax.random.split(key)
        xs = presample_reset_states(k_pre, pool, cfg.rollout_len)
        (env_state, obs, key), traj = jax.lax.scan(
            body, (env_state, obs, key), xs, length=cfg.rollout_len)
        return jax.tree.map(lambda x: x.sum(), traj)

    ro = jax.jit(rollout_only)
    out2 = ro(params, states, obs, key, pool)
    jax.block_until_ready(out2[0])
    t0 = time.perf_counter()
    for _ in range(N):
        out2 = ro(params, states, obs, key, pool)
    jax.block_until_ready(out2[0])
    dro = (time.perf_counter() - t0) / N
    print(f"rollout-only: {dro*1e3:.2f} ms; implied update phase:"
          f" {(dt-dro)*1e3:.2f} ms", flush=True)

    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/ppo_trace"):
            out = train_step(params, opt_state, states, obs, key, pool)
            jax.block_until_ready(out[5]["loss"])
        print("trace written to /tmp/ppo_trace", flush=True)


if __name__ == "__main__":
    main()

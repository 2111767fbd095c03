"""On-chip training proof: train the flagship config to task solution.

Trains PPO with the production fast path (pooled resets, packed obs,
1-epoch updates) through a curriculum of env ids (parameters carry across
stages — all DoorKey sizes share the 7x7 egocentric observation), and
periodically evaluates greedy episode success over >=1024 fresh episodes.
DoorKey-8x8 from scratch is a hard-exploration task (a random policy's
per-episode success is <1e-5: it must pick up the key, open the door, and
reach the goal within 640 steps on sparse reward), so the flagship proof
runs the standard size curriculum; each stage stops at its target rate.

Usage: python -u probes/train_to_success.py stage1,stage2,... [target]
"""
from __future__ import annotations

import json
import sys
import time

T_IMPORT = time.perf_counter()

import jax

import minigrid_tpu
from minigrid_tpu.envs.base import make_layout_pool, refresh_layout_pool
from minigrid_tpu.models.actor_critic import ActorCritic, init_params
from minigrid_tpu.models.eval import evaluate_success
from minigrid_tpu.models.ppo import PPOConfig, make_optimizer, make_train_step


def main():
    stages = (sys.argv[1] if len(sys.argv) > 1 else
              "MiniGrid-DoorKey-5x5-v0,MiniGrid-DoorKey-6x6-v0,"
              "MiniGrid-DoorKey-8x8-v0").split(",")
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95
    budget_updates = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

    cfg = PPOConfig(num_envs=4096, rollout_len=128, lr=2.5e-4)
    model = ActorCritic()
    if len(sys.argv) > 4 and sys.argv[4] == "anneal":
        import optax

        sched = optax.linear_schedule(cfg.lr, cfg.lr * 0.05,
                                      budget_updates * cfg.num_minibatches
                                      * cfg.num_epochs)
        opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                          optax.adam(sched))
    else:
        opt = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    k_init, key = jax.random.split(key)
    params = init_params(k_init, model=model, packed=True)
    opt_state = opt.init(params)
    spu = cfg.num_envs * cfg.rollout_len
    t0 = time.perf_counter()
    total_steps = 0
    t_train = 0.0
    report = []

    for env_id in stages:
        env = minigrid_tpu.make(env_id).packed()
        k_env, k_pool, key = jax.random.split(key, 3)
        pool = make_layout_pool(env, k_pool, 1024)
        obs, st = jax.jit(jax.vmap(env.reset_staggered))(
            jax.random.split(k_env, cfg.num_envs))
        train_step = jax.jit(
            make_train_step(env, model, cfg, opt, pooled=True),
            donate_argnums=(0, 1, 2, 3))
        print(f"[{env_id}] stage start at {time.perf_counter()-t0:.0f}s "
              f"(setup since import: {time.perf_counter()-T_IMPORT:.0f}s)",
              flush=True)
        stage_steps = 0
        rate = 0.0
        eval_every = 16
        for u in range(budget_updates):
            tu = time.perf_counter()
            params, opt_state, st, obs, key, m = train_step(
                params, opt_state, st, obs, key, pool)
            if (u + 1) % 8 == 0:
                pool = refresh_layout_pool(
                    env, jax.random.fold_in(k_pool, u), pool)
            jax.block_until_ready(m["loss"])
            t_train += time.perf_counter() - tu
            stage_steps += spu
            total_steps += spu
            if (u + 1) % eval_every == 0:
                cap = (1024 if env.params.max_steps > (1 << 16) else None)
                rate = evaluate_success(env, model, params, n_episodes=1024,
                                        key=jax.random.fold_in(key, u),
                                        max_steps=cap)
                print(json.dumps({
                    "env": env_id, "update": u + 1,
                    "stage_env_steps": stage_steps,
                    "mean_reward": round(float(m["mean_reward"]), 4),
                    "success_rate": round(rate, 4),
                    "wall_s": round(time.perf_counter() - t0, 1),
                }), flush=True)
                if rate >= target:
                    break
        report.append({"env": env_id, "success_rate": round(rate, 4),
                       "stage_env_steps": stage_steps,
                       "reached": rate >= target})

    print(json.dumps({
        "final": True, "stages": report, "total_env_steps": total_steps,
        "wall_clock_s": round(time.perf_counter() - t0, 1),
        "train_phase_s": round(t_train, 1),
        "train_steps_per_s": round(total_steps / max(t_train, 1e-9)),
    }), flush=True)


if __name__ == "__main__":
    main()

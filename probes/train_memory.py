"""On-chip proof that the recurrent policy family works: train
ActorCriticRNN on MiniGrid-MemoryS7 (unsolvable beyond chance for a
memoryless policy — the clue object leaves the view before the choice
point) with exact fresh resets, evaluating greedy success periodically.

Usage: python -u probes/train_memory.py [env_id] [target] [updates] [mlp]
"""
from __future__ import annotations

import json
import sys
import time

import jax

import minigrid_tpu
from minigrid_tpu.models.actor_critic import (ActorCritic, ActorCriticRNN,
                                              init_params, init_params_rnn)
from minigrid_tpu.models.eval import evaluate_success
from minigrid_tpu.models.ppo import PPOConfig, make_optimizer, make_train_step


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "MiniGrid-MemoryS7-v0"
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    mlp = len(sys.argv) > 4 and sys.argv[4] == "mlp"

    env = minigrid_tpu.make(env_id).packed()
    import os

    lr = float(os.environ.get("LR", "2.5e-4"))
    ent = float(os.environ.get("ENT", "0.01"))
    anneal = os.environ.get("ANNEAL", "0") == "1"
    B = int(os.environ.get("B", "4096"))
    EP = int(os.environ.get("EPOCHS", "1"))
    cfg = PPOConfig(num_envs=B, rollout_len=128, lr=lr, ent_coef=ent,
                    num_epochs=EP)
    if mlp:
        model = ActorCritic()
        params = init_params(jax.random.PRNGKey(0), model=model, packed=True)
    else:
        model = ActorCriticRNN()
        params = init_params_rnn(jax.random.PRNGKey(0), model=model,
                                 packed=True)
    if anneal:
        import optax

        sched = optax.linear_schedule(
            cfg.lr, cfg.lr * 0.05,
            budget * cfg.num_minibatches * cfg.num_epochs)
        opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                          optax.adam(sched))
    else:
        opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    k_env, key = jax.random.split(key)
    obs, st = jax.jit(jax.vmap(env.reset_staggered))(
        jax.random.split(k_env, cfg.num_envs))
    h = None if mlp else model.initial_state(cfg.num_envs)
    # dynamic-budget envs (BabyAI): size the fresh buffer for episodes as
    # short as 8 steps (trained GoTo policies finish fast)
    fb = (cfg.num_envs * cfg.rollout_len // 8
          if env.params.max_steps > 1 << 16 else None)
    ts = jax.jit(make_train_step(env, model, cfg, opt, resets="fresh",
                                 fresh_buffer=fb),
                 donate_argnums=(0, 1, 2, 3))
    t0 = time.perf_counter()
    rate = 0.0
    u = -1
    last_eval = -1
    for u in range(budget):
        if mlp:
            params, opt_state, st, obs, key, m = ts(
                params, opt_state, st, obs, key)
        else:
            params, opt_state, st, obs, h, key, m = ts(
                params, opt_state, st, obs, h, key)
        jax.block_until_ready(m["loss"])
        if u < 2 or (u + 1) % 16 == 0:
            cap = 1024 if env.params.max_steps > (1 << 16) else None
            rate = evaluate_success(env, model, params, n_episodes=1024,
                                    key=jax.random.fold_in(key, u),
                                    max_steps=cap)
            last_eval = u
            print(json.dumps({
                "model": "mlp" if mlp else "rnn", "update": u + 1,
                "mean_reward": round(float(m["mean_reward"]), 4),
                "success_rate": round(rate, 4),
                "wall_s": round(time.perf_counter() - t0, 1)}), flush=True)
            if rate >= target:
                break
    if u >= 0 and last_eval != u:  # re-evaluate the FINAL parameters
        cap = 1024 if env.params.max_steps > (1 << 16) else None
        rate = evaluate_success(env, model, params, n_episodes=1024,
                                key=jax.random.fold_in(key, u),
                                max_steps=cap)
    print(json.dumps({
        "final": True, "env_id": env_id,
        "model": "mlp" if mlp else "rnn",
        "success_rate": round(rate, 4),
        "env_steps": (u + 1) * cfg.num_envs * cfg.rollout_len,
        "wall_clock_s": round(time.perf_counter() - t0, 1),
        "reached_target": rate >= target}), flush=True)


if __name__ == "__main__":
    main()

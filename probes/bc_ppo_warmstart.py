"""Round-5 IL+RL composition: BC-initialize PPO (VERDICT r4 item 8).

Classic warm start: behavior-clone from oracle demos, then fine-tune with
PPO on the chip, against a cold-started control at identical config.
Reports greedy-success curves for both. BC runs on the uint8-image demo
obs; PPO runs on the packed fast path — the encoders produce identical
features for both formats, so the parameters transfer unchanged.

Usage: python -u probes/bc_ppo_warmstart.py [level] [demos] [updates]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import minigrid_tpu
from minigrid_tpu.models.actor_critic import ActorCritic, init_params
from minigrid_tpu.models.bc import behavior_clone
from minigrid_tpu.models.eval import evaluate_success
from minigrid_tpu.models.ppo import PPOConfig, make_optimizer, make_train_step
from minigrid_tpu.utils.demos import DemoBatch


def load_prefix(path: str, n: int) -> DemoBatch:
    z = np.load(path)
    d = {k: z[k][:n] for k in z.files}
    T = int(d["length"].max())
    for k in ("image", "direction", "action", "mask"):
        d[k] = d[k][:, :T]
    return DemoBatch(**d)


def run_ppo(env, model, params, updates, eval_every=4, tag="cold"):
    cfg = PPOConfig(num_envs=4096, rollout_len=128)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(2)
    obs, st = jax.jit(jax.vmap(env.reset_staggered))(
        jax.random.split(jax.random.PRNGKey(3), cfg.num_envs))
    fb = (cfg.num_envs * cfg.rollout_len // 8
          if env.params.max_steps > 1 << 16 else None)
    ts = jax.jit(make_train_step(env, model, cfg, opt, resets="fresh",
                                 fresh_buffer=fb),
                 donate_argnums=(0, 1, 2, 3))
    curve = []
    t0 = time.perf_counter()
    for u in range(updates):
        params, opt_state, st, obs, key, m = ts(
            params, opt_state, st, obs, key)
        if u == 0 or (u + 1) % eval_every == 0:
            rate = evaluate_success(env, model, params, n_episodes=1024,
                                    max_steps=1024,
                                    key=jax.random.fold_in(key, u))
            curve.append({"tag": tag, "update": u + 1,
                          "env_steps": (u + 1) * cfg.num_envs
                          * cfg.rollout_len,
                          "success": round(rate, 4),
                          "wall_s": round(time.perf_counter() - t0, 1)})
            print(json.dumps(curve[-1]), flush=True)
            if rate >= 0.99:
                break
    return curve


def main():
    level = sys.argv[1] if len(sys.argv) > 1 else "BabyAI-GoToLocal-v0"
    n_demos = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    updates = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    env = minigrid_tpu.make(level).packed()
    model = ActorCritic()

    # warm start: BC on the demo prefix
    demos = load_prefix(f"probes/demos_{level}.npz", n_demos)
    params_bc = init_params(jax.random.PRNGKey(0), model=model)
    params_bc, hist = behavior_clone(model, params_bc, demos, epochs=15,
                                     batch_size=256, lr=1e-3)
    bc_rate = evaluate_success(env, model, params_bc, n_episodes=1024,
                               max_steps=1024, key=jax.random.PRNGKey(9))
    print(json.dumps({"tag": "bc_init", "demos": n_demos,
                      "bc_accuracy": round(hist[-1]["accuracy"], 4),
                      "success": round(bc_rate, 4)}), flush=True)
    warm = run_ppo(env, model, params_bc, updates, tag="bc_warm")

    # cold control at identical config
    params_cold = init_params(jax.random.PRNGKey(0), model=model,
                              packed=True)
    cold = run_ppo(env, model, params_cold, updates, tag="cold")

    with open(f"probes/bc_ppo_{level}.json", "w") as f:
        json.dump({"bc_success": bc_rate, "warm": warm, "cold": cold}, f,
                  indent=1)


if __name__ == "__main__":
    main()

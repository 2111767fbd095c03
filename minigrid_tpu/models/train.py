"""End-to-end PPO training driver.

The reference ships no training code (its README points at the external
rl-starter-files); this is the turnkey loop over the framework's fast path:
packed observations, staggered batch init, pooled broadcast-row auto-resets
with off-hot-path pool refreshes, optional device-mesh sharding, periodic
checkpointing (utils/checkpoint.py) and a metrics history.

    from minigrid_tpu.models.train import TrainConfig, train
    params, history = train("MiniGrid-DoorKey-8x8-v0",
                            TrainConfig(total_env_steps=50_000_000))
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.envs.base import make_layout_pool, refresh_layout_pool
from minigrid_tpu.models.actor_critic import ActorCritic, init_params
from minigrid_tpu.models.ppo import PPOConfig, make_optimizer, make_train_step


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    total_env_steps: int = 10_000_000
    ppo: PPOConfig = dataclasses.field(default_factory=PPOConfig)
    hidden: int = 256
    seed: int = 0
    packed_obs: bool = True        # single-lane observations (fast path)
    # recurrent policy (ActorCriticRNN): hidden state threads across
    # updates; requires shuffle="rotate" (the default)
    recurrent: bool = False
    # reset mode: None -> "pooled" if pool_size > 0 else "regen";
    # "fresh" = exact-distribution resets from an in-step buffer
    # (no pool, near-pooled speed — models/ppo.py make_train_step)
    resets: str | None = None
    fresh_buffer: int | None = None  # override for dynamic-budget envs
    # train steps scanned per compiled dispatch (make_train_loop):
    # amortizes ~3 ms host latency per dispatch; with pooled resets one
    # pool serves the whole call (so this doubles as the refresh cadence)
    steps_per_call: int = 1
    pool_size: int = 1024          # 0 disables pooling (exact resets)
    pool_refresh_every: int = 8    # train steps between pool refreshes
    checkpoint_dir: str | None = None
    checkpoint_every: int = 100    # train steps between checkpoints
    log_every: int = 10
    devices: int = 1               # data-parallel mesh size (1 = no mesh)


def train(env_id: str, cfg: TrainConfig = TrainConfig(),
          log_fn: Callable[[dict], None] | None = None):
    """Run PPO to ``total_env_steps``; returns (params, history)."""
    env = minigrid_tpu.make(env_id)
    if cfg.packed_obs:
        env = env.packed()
    pcfg = cfg.ppo
    if cfg.recurrent:
        from minigrid_tpu.models.actor_critic import (ActorCriticRNN,
                                                      init_params_rnn)

        model = ActorCriticRNN(hidden=cfg.hidden)
        _init = init_params_rnn
    else:
        model = ActorCritic(hidden=cfg.hidden)
        _init = init_params
    opt = make_optimizer(pcfg)
    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_env, k_pool, key = jax.random.split(key, 4)
    params = _init(k_init, view_size=env.params.view_size,
                   model=model, packed=cfg.packed_obs)

    resets = cfg.resets or ("pooled" if cfg.pool_size > 0 else "regen")
    pooled = resets == "pooled"
    if pooled and cfg.pool_size <= 0:
        raise ValueError(
            f"resets='pooled' needs pool_size > 0 (got pool_size="
            f"{cfg.pool_size}); a size-0 LayoutPool would fail at trace "
            "time with an opaque randint error — either raise pool_size "
            "or pick resets='fresh'/'regen'")
    pool = (make_layout_pool(env, k_pool, cfg.pool_size) if pooled else None)
    K = max(1, cfg.steps_per_call)
    kw = dict(resets=resets, fresh_buffer=cfg.fresh_buffer)
    if K > 1:
        from minigrid_tpu.models.ppo import make_train_loop

        train_step = make_train_loop(env, model, pcfg, opt,
                                     steps_per_call=K, **kw)
    else:
        train_step = make_train_step(env, model, pcfg, opt, **kw)

    if cfg.devices > 1:
        from minigrid_tpu.parallel import mesh as M

        mesh = M.make_mesh(cfg.devices, model_parallel=1)
        params = M.shard_params(mesh, params)
        reset = jax.jit(jax.vmap(env.reset_staggered),
                        out_shardings=(M.batch_sharding(mesh),) * 2)
        bs = M.batch_sharding(mesh)
        in_sh = ((M.param_shardings(mesh, params), None, bs, bs, bs, None,
                  None) if cfg.recurrent else
                 (M.param_shardings(mesh, params), None, bs, bs, None,
                  None))
        train_step = jax.jit(train_step, in_shardings=in_sh,
                             donate_argnums=(0, 1, 2, 3))
    else:
        reset = jax.jit(jax.vmap(env.reset_staggered))
        train_step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3))
    opt_state = opt.init(params)  # after optional sharding: init once

    obs, st = reset(jax.random.split(k_env, pcfg.num_envs))
    h = model.initial_state(pcfg.num_envs) if cfg.recurrent else None

    steps_per_update = pcfg.num_envs * pcfg.rollout_len * K
    num_updates = max(1, cfg.total_env_steps // steps_per_update)
    history = []
    t0 = time.perf_counter()
    for u in range(num_updates):
        if cfg.recurrent:
            params, opt_state, st, obs, h, key, m = train_step(
                params, opt_state, st, obs, h, key, pool)
        else:
            params, opt_state, st, obs, key, m = train_step(
                params, opt_state, st, obs, key, pool)
        if K > 1:  # metrics stacked (K, ...): report the last step's
            m = jax.tree.map(lambda x: x[-1], m)
        if pooled and (u + 1) % cfg.pool_refresh_every == 0:
            pool = refresh_layout_pool(
                env, jax.random.fold_in(k_pool, u), pool)
        if (u + 1) % cfg.log_every == 0 or u == num_updates - 1:
            metrics = {k: float(v) for k, v in m.items()}
            metrics["update"] = u + 1
            metrics["env_steps"] = (u + 1) * steps_per_update
            metrics["env_steps_per_s"] = metrics["env_steps"] / (
                time.perf_counter() - t0)
            history.append(metrics)
            if log_fn is not None:
                log_fn(metrics)
        if cfg.checkpoint_dir and (u + 1) % cfg.checkpoint_every == 0:
            from minigrid_tpu.utils.checkpoint import save_pytree

            save_pytree(f"{cfg.checkpoint_dir}/step_{u + 1}",
                        {"params": params, "opt_state": opt_state})
    return params, history


def main():  # pragma: no cover - CLI convenience
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env", default="MiniGrid-Empty-8x8-v0")
    ap.add_argument("--total-env-steps", type=int, default=10_000_000)
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()
    cfg = TrainConfig(
        total_env_steps=args.total_env_steps,
        ppo=PPOConfig(num_envs=args.num_envs),
        hidden=args.hidden, seed=args.seed,
        checkpoint_dir=args.checkpoint_dir)
    _, history = train(args.env, cfg, log_fn=lambda m: print(json.dumps(m)))
    print(json.dumps({"final": history[-1] if history else {}}))


if __name__ == "__main__":
    main()

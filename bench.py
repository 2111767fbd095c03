"""Headline benchmark: aggregate env-steps/s, 4096 batched DoorKey-8x8 envs.

Methodology mirrors the measured reference baseline (BASELINE.md): pure
stepping with a fixed pseudo-random action stream, observations generated
every step (the reference hot loop minigrid_env.py:525-595 + gen_obs). The
loop runs device-side as ``jit(scan(step))`` in chunks; the action stream
for each chunk is drawn in one batched PRNG call. Reported rate = total env
transitions / wall clock over several back-to-back chunks with one final
device sync (steady-state throughput; host dispatch overlaps device
compute exactly as in a real training loop).

The headline metric steps with packed observations (EnvParams.packed_obs —
the policy-consumable format the bundled ActorCritic embeds directly);
extra keys record the uint8-image path (the reference's observation
contract), the two auto-reset paths that training actually runs (pooled
broadcast-row and exact per-env regeneration), and the full PPO train step
(rollout + GAE + minibatched updates, env-steps/s).

Layout generation is compiled ONCE (a batched ``_gen_grid``); every
benchmark derives its initial states, observations and the layout pool
from that single batch, so wall-clock goes to measurement, not compiles.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is the speedup over the reference's single-core DoorKey-8x8
rate (~8,300 steps/s, BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core.obs import gen_obs
from minigrid_tpu.envs.base import (LayoutPool, _serialize_stacked,
                                    autoreset_step_fresh,
                                    presample_fresh_reset_states,
                                    presample_reset_states)

REFERENCE_DOORKEY_STEPS_PER_S = 8300.0  # BASELINE.md, 1 CPU core
ENV_ID = "MiniGrid-DoorKey-8x8-v0"
BATCH = 4096
POOL_SIZE = 1024


def bench_step(env, mode: str, states, chunk=4096, repeats=6, pool=None):
    """mode: 'pure' | 'autoreset_pooled' | 'autoreset_exact'."""
    batch = states.agent_dir.shape[0]
    obs_key = "packed" if env.params.packed_obs else "image"
    if mode == "pure":
        step = jax.vmap(env.step)
    elif mode == "autoreset_regen":
        # the semantic reference path: full per-env _gen_grid every step,
        # selected into finished envs (rounds 1-3 reported this as
        # "autoreset_exact"; the fresh-buffer scheme below replaced it as
        # the exact-distribution FAST path)
        step = jax.vmap(env.step_autoreset)
    elif mode == "autoreset_exact":
        # fresh-buffer exact path (envs/base.py autoreset_step_fresh): a
        # per-chunk buffer of independent _gen_grid draws, consumed at most
        # once each via cursor + rank routing. Buffer sized to expected
        # consumption (~B/max_steps per step, staggered) plus a CLT margin.
        step = None
        n_buf = int(chunk * batch / env.params.max_steps * 1.15) + 256
    else:
        step = None  # pooled: presampled broadcast resets (envs/base.py)

    def run_chunk(state, key, pool):
        key, k_act, k_step = jax.random.split(key, 3)
        actions = jax.random.randint(k_act, (chunk, batch), 0, 7)
        step_keys = jax.vmap(lambda i: jax.random.fold_in(k_step, i))(
            jnp.arange(chunk))
        if pool is not None:
            key, k_pre = jax.random.split(key)
            xs = (step_keys, actions,
                  presample_reset_states(k_pre, pool, chunk))
        else:
            xs = (step_keys, actions)
        if mode == "autoreset_exact":
            key, k_gen = jax.random.split(key)
            buffer = presample_fresh_reset_states(env, k_gen, n_buf)

        def body(carry, xs):
            state, cursor = carry
            k, a = xs[0], xs[1]
            keys = jax.random.split(k, batch)
            if mode == "autoreset_exact":
                obs, state, reward, term, trunc, _, cursor = \
                    autoreset_step_fresh(env, keys, state, a, buffer, cursor)
            elif pool is not None:
                obs, state, reward, term, trunc, _ = \
                    env.step_autoreset_presampled(keys, state, a, xs[2])
            else:
                obs, state, reward, term, trunc, _ = step(keys, state, a)
            # consume obs so observation generation stays in the graph
            o = obs[obs_key] if isinstance(obs, dict) else obs
            probe = o.astype(jnp.int32).sum() + reward.sum()
            return (state, cursor), probe

        (state, _), probes = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.int32)), xs, unroll=8)
        return state, key, probes.sum()

    run_chunk = jax.jit(run_chunk, donate_argnums=(0,))
    state = jax.tree.map(jnp.copy, states)  # donation-safe
    state, key, probe = run_chunk(state, jax.random.PRNGKey(1), pool)
    jax.block_until_ready(probe)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(repeats):
        state, key, probe = run_chunk(state, key, pool)
    jax.block_until_ready(probe)
    return repeats * batch * chunk / (time.perf_counter() - t0)


def bench_ppo(env, pool, states, obs, rollout_len=128, repeats=6,
              resets="pooled"):
    """Full PPO train step (rollout + GAE + update), env-steps/s."""
    from minigrid_tpu.models.actor_critic import ActorCritic, init_params
    from minigrid_tpu.models.ppo import (PPOConfig, make_optimizer,
                                         make_train_step)

    batch = states.agent_dir.shape[0]
    cfg = PPOConfig(num_envs=batch, rollout_len=rollout_len)
    model = ActorCritic()
    opt = make_optimizer(cfg)
    params = init_params(jax.random.PRNGKey(0),
                         view_size=env.params.view_size, model=model,
                         packed=env.params.packed_obs)
    opt_state = opt.init(params)
    st = jax.tree.map(jnp.copy, states)
    obs = jax.tree.map(jnp.copy, obs)
    train_step = jax.jit(make_train_step(env, model, cfg, opt,
                                         resets=resets),
                         donate_argnums=(0, 1, 2, 3))
    key = jax.random.PRNGKey(2)
    out = train_step(params, opt_state, st, obs, key, pool)
    jax.block_until_ready(out[5]["loss"])  # compile + warmup
    params, opt_state, st, obs, key, _ = out
    t0 = time.perf_counter()
    for _ in range(repeats):
        params, opt_state, st, obs, key, m = train_step(
            params, opt_state, st, obs, key, pool)
    jax.block_until_ready(m["loss"])
    return repeats * batch * rollout_len / (time.perf_counter() - t0)


def bench_ppo_loop(env, states, obs, rollout_len=128, K=8, repeats=3):
    """K train steps scanned per dispatch (make_train_loop, fresh resets):
    the production training-loop rate with host dispatch amortized."""
    from minigrid_tpu.models.actor_critic import ActorCritic, init_params
    from minigrid_tpu.models.ppo import (PPOConfig, make_optimizer,
                                         make_train_loop)

    batch = states.agent_dir.shape[0]
    cfg = PPOConfig(num_envs=batch, rollout_len=rollout_len)
    model = ActorCritic()
    opt = make_optimizer(cfg)
    params = init_params(jax.random.PRNGKey(0),
                         view_size=env.params.view_size, model=model,
                         packed=env.params.packed_obs)
    opt_state = opt.init(params)
    st = jax.tree.map(jnp.copy, states)
    obs = jax.tree.map(jnp.copy, obs)
    loop = jax.jit(make_train_loop(env, model, cfg, opt, steps_per_call=K,
                                   resets="fresh"),
                   donate_argnums=(0, 1, 2, 3))
    key = jax.random.PRNGKey(2)
    out = loop(params, opt_state, st, obs, key)
    jax.block_until_ready(out[5]["loss"])
    params, opt_state, st, obs, key, _ = out
    t0 = time.perf_counter()
    for _ in range(repeats):
        params, opt_state, st, obs, key, m = loop(
            params, opt_state, st, obs, key)
    jax.block_until_ready(m["loss"])
    return repeats * K * batch * rollout_len / (time.perf_counter() - t0)


def bench(env_id: str = ENV_ID, batch: int = BATCH, chunk: int = 2048,
          repeats: int = 8) -> float:
    """Single-number batched throughput for one env id (the
    minigrid_tpu.benchmark CLI's aggregate phase; uint8-image obs so any
    env id works unmodified)."""
    env = minigrid_tpu.make(env_id)
    gen = jax.jit(jax.vmap(env._gen_grid))
    states = gen(jax.random.split(jax.random.PRNGKey(0), batch))
    jax.block_until_ready(states.grid)
    return bench_step(env, "pure", states, chunk=chunk, repeats=repeats)


def main():
    env = minigrid_tpu.make(ENV_ID)
    envp = env.packed()

    # ONE compiled layout generator feeds every benchmark below
    gen = jax.jit(jax.vmap(env._gen_grid))
    states = gen(jax.random.split(jax.random.PRNGKey(0), BATCH))
    jax.block_until_ready(states.grid)
    # pool from the first POOL_SIZE layouts; staggered step_counts for the
    # auto-reset paths (desynchronized truncation; envs/base.py)
    pool_states = jax.tree.map(lambda x: x[:POOL_SIZE], states)
    pool = jax.jit(
        lambda t: LayoutPool(*_serialize_stacked(t)))(pool_states)
    offs = jax.random.randint(jax.random.PRNGKey(3), (BATCH,), 0,
                              env.params.max_steps)
    staggered = states.replace(step_count=offs)
    obs_p = jax.jit(jax.vmap(
        lambda s: gen_obs(envp.params, s)))(staggered)

    rate_packed = bench_step(envp, "pure", states)
    rate_uint8 = bench_step(env, "pure", states)
    rate_pooled = bench_step(envp, "autoreset_pooled", staggered, pool=pool)
    rate_exact = bench_step(envp, "autoreset_exact", staggered)
    rate_regen = bench_step(envp, "autoreset_regen", staggered, chunk=512,
                            repeats=3)
    # a wrapped pooled config: stateless observation wrappers ride the
    # pooled fast path through the chain-applying Wrapper methods
    from minigrid_tpu.wrappers import ImgObsWrapper

    rate_wrapped = bench_step(ImgObsWrapper(envp), "autoreset_pooled",
                              staggered, pool=pool)
    rate_ppo = bench_ppo(envp, pool, staggered, obs_p)
    rate_ppo_fresh = bench_ppo(envp, None, staggered, obs_p,
                               resets="fresh")
    rate_ppo_loop = bench_ppo_loop(envp, staggered, obs_p)

    print(json.dumps({
        "metric": "doorkey8x8_env_steps_per_s_4096envs",
        "value": round(rate_packed),
        "unit": "steps/s",
        "obs_format": "packed_int32 (policy-consumable single-lane view)",
        "vs_baseline": round(rate_packed / REFERENCE_DOORKEY_STEPS_PER_S, 2),
        # apples-to-apples with BASELINE.md / prior rounds: the reference's
        # uint8 image observation contract
        "pure_step_image_uint8": round(rate_uint8),
        "vs_baseline_image_uint8": round(
            rate_uint8 / REFERENCE_DOORKEY_STEPS_PER_S, 2),
        "autoreset_pooled": round(rate_pooled),
        "autoreset_exact": round(rate_exact),
        "autoreset_regen": round(rate_regen),
        "autoreset_pooled_imgobs_wrapped": round(rate_wrapped),
        "ppo_train_step": round(rate_ppo),
        "ppo_train_step_fresh_resets": round(rate_ppo_fresh),
        "ppo_train_loop_x8_fresh": round(rate_ppo_loop),
    }))


if __name__ == "__main__":
    main()

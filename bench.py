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

Prints the record as a JSON line {"metric", "value", "unit",
"vs_baseline", ...}; the LAST line printed is the complete record (an
early flushed line carries the headline keys alone so a timeout kill
during the long per-family sweep cannot lose the whole run).
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
              resets="pooled", fresh_buffer=None):
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
                                         resets=resets,
                                         fresh_buffer=fresh_buffer),
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


def bench_fresh_calibrated(env, states, chunk=1024, repeats=3):
    """Fresh exact-distribution auto-reset rate with MEASURED buffer
    sizing: one calibration chunk sized from the truncation budget, then
    the buffer resizes to the measured reset consumption (short-episode
    families — lava deaths, tight BabyAI budgets — reset far more often
    than max_steps predicts). Returns (steps/s, resets/s, n_buf,
    overflow)."""
    batch = states.agent_dir.shape[0]
    obs_key = "packed" if env.params.packed_obs else "image"
    ms = int(env.params.max_steps)
    if ms > 1 << 16:  # BabyAI dynamic-budget sentinel
        ms = int(jnp.max(states.extra["max_steps"]))
    n_buf = int(chunk * batch / ms * 1.3) + 256

    def make_run(n_buf):
        mean_step = n_buf / chunk
        window = min(max(32, int(2 * mean_step + 6 * mean_step ** 0.5) + 1),
                     n_buf)

        def run_chunk(state, key):
            key, k_act, k_step, k_gen = jax.random.split(key, 4)
            actions = jax.random.randint(k_act, (chunk, batch), 0, 7)
            step_keys = jax.vmap(lambda i: jax.random.fold_in(k_step, i))(
                jnp.arange(chunk))
            buffer = presample_fresh_reset_states(env, k_gen, n_buf)

            def body(carry, xs):
                state, cursor, oflow = carry
                keys = jax.random.split(xs[0], batch)
                obs, state, reward, term, trunc, info, cursor = \
                    autoreset_step_fresh(env, keys, state, xs[1], buffer,
                                         cursor, window=window)
                o = obs[obs_key] if isinstance(obs, dict) else obs
                probe = o.astype(jnp.int32).sum() + reward.sum()
                return (state, cursor, oflow + info["reset_overflow"]), probe

            (state, cursor, oflow), probes = jax.lax.scan(
                body, (state, jnp.zeros((), jnp.int32),
                       jnp.zeros((), jnp.int32)), (step_keys, actions),
                unroll=8)
            return state, key, probes.sum(), oflow, cursor

        return jax.jit(run_chunk, donate_argnums=(0,))

    run = make_run(n_buf)
    state = jax.tree.map(jnp.copy, states)
    state, key, probe, oflow, cursor = run(state, jax.random.PRNGKey(1))
    jax.block_until_ready(probe)
    consumed = int(cursor) + int(oflow)
    need = int(consumed * 1.3) + 256
    if need > n_buf * 1.1:  # calibration found a faster reset clock
        n_buf = need
        run = make_run(n_buf)
        state, key, probe, oflow, cursor = run(state, key)
        jax.block_until_ready(probe)
    t0 = time.perf_counter()
    total_oflow = total_resets = 0
    for _ in range(repeats):
        state, key, probe, oflow, cursor = run(state, key)
        total_oflow += int(oflow)
        total_resets += int(cursor)
    jax.block_until_ready(probe)
    dt = time.perf_counter() - t0
    return (repeats * batch * chunk / dt, total_resets / dt, n_buf,
            total_oflow)


# the BASELINE.json config families beyond the flagship DoorKey: hazard
# termination + maze gen, multi-room heavy gen, boxes-hiding-keys, and the
# BabyAI instruction/verifier stack (tokenized missions in the hot loop)
FAMILY_IDS = [
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-LavaCrossingS9N2-v0",
    "MiniGrid-FourRooms-v0",
    "MiniGrid-KeyCorridorS6R3-v0",
    "MiniGrid-ObstructedMaze-2Dlh-v0",
    "BabyAI-GoToObj-v0",
    "BabyAI-PutNextLocal-v0",
]
PPO_FAMILY_IDS = {"BabyAI-GoToObj-v0", "BabyAI-PutNextLocal-v0"}


def bench_family(env_id: str) -> dict:
    """Per-family keys: cold gen-compile seconds, pure batched stepping,
    pooled auto-reset, fresh exact auto-reset (+ resets/s — the honest
    denominator for short-episode families), and for the BabyAI ids the
    full PPO train step with the verifier in the loop."""
    env = minigrid_tpu.make(env_id).packed()
    rec = {}
    t0 = time.perf_counter()
    gen = jax.jit(jax.vmap(env._gen_grid))
    states = gen(jax.random.split(jax.random.PRNGKey(0), BATCH))
    jax.block_until_ready(states.grid)
    rec["gen_compile_s"] = round(time.perf_counter() - t0, 1)

    ms = int(env.params.max_steps)
    if ms > 1 << 16:
        ms = int(jnp.max(states.extra["max_steps"]))
    offs = jax.random.randint(jax.random.PRNGKey(3), (BATCH,), 0, ms)
    staggered = states.replace(step_count=offs)

    rec["pure_step"] = round(bench_step(env, "pure", states, chunk=2048,
                                        repeats=3))
    pool_states = jax.tree.map(lambda x: x[:POOL_SIZE], states)
    pool = jax.jit(lambda t: LayoutPool(*_serialize_stacked(t)))(pool_states)
    rec["autoreset_pooled"] = round(bench_step(
        env, "autoreset_pooled", staggered, chunk=1024, repeats=3,
        pool=pool))
    rate, resets_s, n_buf, oflow = bench_fresh_calibrated(env, staggered)
    rec["autoreset_fresh"] = round(rate)
    rec["fresh_resets_per_s"] = round(resets_s)
    rec["fresh_overflow"] = oflow

    if env_id in PPO_FAMILY_IDS:
        fresh_buffer = int(BATCH * 128 / ms * 1.3) + 256
        rec["ppo_train_step"] = round(bench_ppo(
            env, None, staggered, jax.jit(jax.vmap(
                lambda s: gen_obs(env.params, s)))(staggered),
            repeats=3, resets="fresh", fresh_buffer=fresh_buffer))
    return rec


def bench_ppo_rnn(env, states, obs, rollout_len=128, repeats=4):
    """Recurrent (GRU) PPO train step, env-steps/s — the policy family
    that solves the Memory/partial-obs tail (VERDICT r4 item 2)."""
    from minigrid_tpu.models.actor_critic import (ActorCriticRNN,
                                                  init_params_rnn)
    from minigrid_tpu.models.ppo import (PPOConfig, make_optimizer,
                                         make_train_step)

    batch = states.agent_dir.shape[0]
    cfg = PPOConfig(num_envs=batch, rollout_len=rollout_len)
    model = ActorCriticRNN()
    opt = make_optimizer(cfg)
    params = init_params_rnn(jax.random.PRNGKey(0),
                             view_size=env.params.view_size, model=model,
                             packed=env.params.packed_obs)
    opt_state = opt.init(params)
    st = jax.tree.map(jnp.copy, states)
    obs = jax.tree.map(jnp.copy, obs)
    h = model.initial_state(batch)
    train_step = jax.jit(make_train_step(env, model, cfg, opt,
                                         resets="fresh"),
                         donate_argnums=(0, 1, 2, 3, 4))
    key = jax.random.PRNGKey(2)
    out = train_step(params, opt_state, st, obs, h, key)
    jax.block_until_ready(out[6]["loss"])
    params, opt_state, st, obs, h, key, _ = out
    t0 = time.perf_counter()
    for _ in range(repeats):
        params, opt_state, st, obs, h, key, m = train_step(
            params, opt_state, st, obs, h, key)
    jax.block_until_ready(m["loss"])
    return repeats * batch * rollout_len / (time.perf_counter() - t0)


def bench_wfc(preset: str = "MazeSimple", batch: int = 32,
              repeats: int = 3) -> dict:
    """Batched on-chip WFC reset: full solver (collapse/propagate loops) +
    connectivity post-processing per layout. The reference's numpy solver
    runs one attempt at a time on host
    (minigrid/envs/wfc/wfclogic/solver.py:422-484)."""
    env = minigrid_tpu.make(f"MiniGrid-WFC-{preset}-v0")
    t0 = time.perf_counter()
    gen = jax.jit(jax.vmap(env._gen_grid))
    states = gen(jax.random.split(jax.random.PRNGKey(0), batch))
    jax.block_until_ready(states.grid)
    compile_s = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for i in range(repeats):
        states = gen(jax.random.split(jax.random.PRNGKey(i + 1), batch))
    jax.block_until_ready(states.grid)
    dt = time.perf_counter() - t0
    return {"layouts_per_s": round(repeats * batch / dt, 2),
            "batch": batch, "gen_compile_s": compile_s}


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
    rate_ppo_rnn = bench_ppo_rnn(envp, staggered, obs_p)

    # NoDeath on lava through the pooled fast path (wrapper TransitionWrapper
    # composition): the standard no-terminate-on-lava training setup
    from minigrid_tpu.wrappers import NoDeath

    lava = minigrid_tpu.make("MiniGrid-LavaCrossingS9N2-v0").packed()
    lgen = jax.jit(jax.vmap(lava._gen_grid))
    lstates = lgen(jax.random.split(jax.random.PRNGKey(5), BATCH))
    loffs = jax.random.randint(jax.random.PRNGKey(6), (BATCH,), 0,
                               lava.params.max_steps)
    lpool = jax.jit(lambda t: LayoutPool(*_serialize_stacked(t)))(
        jax.tree.map(lambda x: x[:POOL_SIZE], lstates))
    rate_nodeath = bench_step(
        NoDeath(lava, no_death_types=("lava",)), "autoreset_pooled",
        lstates.replace(step_count=loffs), chunk=1024, repeats=3,
        pool=lpool)

    record = {
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
        "ppo_train_step_rnn": round(rate_ppo_rnn),
        "autoreset_pooled_nodeath_lava": round(rate_nodeath),
    }
    # Flush the headline record BEFORE the ~12-minute per-family sweep so
    # an external timeout kill still leaves a parseable JSON line (stdout
    # through a pipe is block-buffered; a mid-sweep SIGKILL would
    # otherwise lose everything). A completed run prints the FULL record
    # as its last line, which supersedes this one for tail-parsers.
    print(json.dumps({**record, "families": "in progress (partial line; "
                      "superseded by the final line if present)"}),
          flush=True)

    families = {}
    for fam_id in FAMILY_IDS:
        t_fam = time.perf_counter()
        families[fam_id] = bench_family(fam_id)
        families[fam_id]["wall_s"] = round(time.perf_counter() - t_fam, 1)
    wfc = bench_wfc()

    print(json.dumps({**record, "families": families, "wfc_reset": wfc}))


if __name__ == "__main__":
    main()

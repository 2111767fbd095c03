"""Round-5 scout: per-family chip throughput + compile latency.

Covers the BASELINE.json config families beyond DoorKey (VERDICT r4 items
1 and 4): for each env id, measure the cold-compile wall-clock of the
batched layout generator and of the step programs, then steady-state
rates for pure stepping and the fresh exact-distribution auto-reset.
Writes one JSON line per family to probes/family_scout.out as it goes
(the tunnel serializes clients; run alone, foreground or nohup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import minigrid_tpu
from bench import bench_step

FAMILIES = [
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-LavaCrossingS9N2-v0",
    "MiniGrid-FourRooms-v0",
    "MiniGrid-KeyCorridorS6R3-v0",
    "MiniGrid-ObstructedMaze-2Dlh-v0",
    "BabyAI-GoToObj-v0",
    "BabyAI-PutNextLocal-v0",
]

BATCH = 4096


def real_max_steps(env, states) -> int:
    ms = int(env.params.max_steps)
    if ms <= 1 << 16:
        return ms
    # BabyAI dynamic budget: per-episode budget lives in extra["max_steps"]
    return int(jnp.max(states.extra["max_steps"]))


def scout(env_id: str, out):
    rec = {"env_id": env_id, "batch": BATCH}
    env = minigrid_tpu.make(env_id).packed()

    t0 = time.perf_counter()
    gen = jax.jit(jax.vmap(env._gen_grid))
    states = gen(jax.random.split(jax.random.PRNGKey(0), BATCH))
    jax.block_until_ready(states.grid)
    rec["gen_compile_s"] = round(time.perf_counter() - t0, 1)

    ms = real_max_steps(env, states)
    rec["episode_budget"] = ms
    offs = jax.random.randint(jax.random.PRNGKey(3), (BATCH,), 0, ms)
    staggered = states.replace(step_count=offs)

    t0 = time.perf_counter()
    rate_pure = bench_step(env, "pure", states, chunk=2048, repeats=4)
    rec["pure_step_wall_s"] = round(time.perf_counter() - t0, 1)
    rec["pure_step_rate"] = round(rate_pure)

    # fresh exact auto-reset. Buffer sizing: max_steps only bounds the
    # reset rate for truncation-dominated envs; under random actions many
    # families terminate much sooner (lava deaths, obstacle collisions),
    # so run one calibration chunk and size from the MEASURED reset count
    chunk = 1024
    n_buf = int(chunk * BATCH / ms * 1.3) + 256
    t0 = time.perf_counter()
    try:
        rate_fresh, n_buf, oflow = bench_fresh(env, staggered, n_buf,
                                               chunk=chunk, repeats=4)
        rec["fresh_rate"] = round(rate_fresh)
        rec["fresh_overflow"] = oflow
    except Exception as e:  # keep scouting other families
        rec["fresh_error"] = repr(e)[:200]
    rec["fresh_n_buf"] = n_buf
    rec["fresh_wall_s"] = round(time.perf_counter() - t0, 1)

    out.write(json.dumps(rec) + "\n")
    out.flush()


def bench_fresh(env, states, n_buf, chunk=1024, repeats=4):
    from minigrid_tpu.envs.base import (autoreset_step_fresh,
                                        presample_fresh_reset_states)

    batch = states.agent_dir.shape[0]
    obs_key = "packed" if env.params.packed_obs else "image"

    def make_run(n_buf):
        mean_step = n_buf / chunk
        window = max(32, int(2 * mean_step + 6 * mean_step ** 0.5) + 1)
        window = min(window, n_buf)

        def run_chunk(state, key):
            key, k_act, k_step, k_gen = jax.random.split(key, 4)
            actions = jax.random.randint(k_act, (chunk, batch), 0, 7)
            step_keys = jax.vmap(lambda i: jax.random.fold_in(k_step, i))(
                jnp.arange(chunk))
            buffer = presample_fresh_reset_states(env, k_gen, n_buf)

            def body(carry, xs):
                state, cursor, oflow = carry
                k, a = xs
                keys = jax.random.split(k, batch)
                obs, state, reward, term, trunc, info, cursor = \
                    autoreset_step_fresh(env, keys, state, a, buffer,
                                         cursor, window=window)
                o = obs[obs_key] if isinstance(obs, dict) else obs
                probe = o.astype(jnp.int32).sum() + reward.sum()
                return (state, cursor, oflow + info["reset_overflow"]), \
                    probe

            (state, cursor, oflow), probes = jax.lax.scan(
                body, (state, jnp.zeros((), jnp.int32),
                       jnp.zeros((), jnp.int32)), (step_keys, actions),
                unroll=8)
            return state, key, probes.sum(), oflow, cursor

        return jax.jit(run_chunk, donate_argnums=(0,))

    # calibration: one chunk at the truncation-based size, then resize
    # from the measured consumption (cursor = resets this chunk)
    run = make_run(n_buf)
    state = jax.tree.map(jnp.copy, states)
    state, key, probe, oflow, cursor = run(state, jax.random.PRNGKey(1))
    jax.block_until_ready(probe)
    consumed = int(cursor) + int(oflow)
    need = int(consumed * 1.3) + 256
    if need > n_buf * 1.1:
        print(f"  resizing buffer {n_buf} -> {need} "
              f"(measured {consumed} resets/chunk)")
        n_buf = need
        run = make_run(n_buf)
        state, key, probe, oflow, cursor = run(state, key)
        jax.block_until_ready(probe)

    t0 = time.perf_counter()
    total_oflow = 0
    for _ in range(repeats):
        state, key, probe, oflow, cursor = run(state, key)
        total_oflow += int(oflow)
    jax.block_until_ready(probe)
    dt = time.perf_counter() - t0
    print(f"  fresh overflow across {repeats} chunks: {total_oflow}")
    return repeats * batch * chunk / dt, n_buf, total_oflow


if __name__ == "__main__":
    import sys

    ids = sys.argv[1:] or FAMILIES
    with open("probes/family_scout.out", "a") as out:
        for env_id in ids:
            print(f"=== {env_id}", flush=True)
            t0 = time.perf_counter()
            scout(env_id, out)
            print(f"=== {env_id} done in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)

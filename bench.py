"""Headline benchmark: aggregate env-steps/s, 4096 batched DoorKey-8x8 envs.

Methodology mirrors the measured reference baseline (BASELINE.md): pure
stepping with a fixed pseudo-random action stream, observations generated
every step (the reference hot loop minigrid_env.py:525-595 + gen_obs). Here
the loop runs device-side as ``jit(scan(vmap(step)))`` in chunks; the action
stream for each chunk is drawn in one batched PRNG call (same stream, fewer
dispatches than per-step draws). Reported rate = total env transitions /
wall clock over several back-to-back chunks with one final device sync
(steady-state throughput: the host-side dispatch latency of the remote-TPU
tunnel overlaps with device compute, exactly as in a real training loop).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup over the reference's single-core DoorKey-8x8
rate (~8,300 steps/s, BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import minigrid_tpu

REFERENCE_DOORKEY_STEPS_PER_S = 8300.0  # BASELINE.md, 1 CPU core


def build(env_id: str, batch: int, chunk: int, unroll: int = 8):
    env = minigrid_tpu.make(env_id)
    reset = jax.jit(jax.vmap(env.reset))
    step = jax.vmap(env.step)

    def run_chunk(state, key):
        key, k_act, k_step = jax.random.split(key, 3)
        # the whole chunk's action stream in one PRNG call
        actions = jax.random.randint(k_act, (chunk, batch), 0, 7)
        # fresh per-(step, env) keys: fold the step index into the chunk key
        # so stochastic envs (e.g. DynamicObstacles) draw independent
        # randomness every step, then split per env inside the scan body
        step_keys = jax.vmap(lambda i: jax.random.fold_in(k_step, i))(
            jnp.arange(chunk)
        )

        def body(carry, xs):
            (state,) = carry
            k, a = xs
            keys = jax.random.split(k, batch)
            obs, state, reward, term, trunc, _ = step(keys, state, a)
            # consume obs so observation generation stays in the graph
            probe = obs["image"].astype(jnp.int32).sum() + reward.sum()
            return (state,), probe

        (state,), probes = jax.lax.scan(
            body, (state,), (step_keys, actions), unroll=unroll
        )
        return state, key, probes.sum()

    return env, reset, jax.jit(run_chunk, donate_argnums=(0,))


def bench(env_id="MiniGrid-DoorKey-8x8-v0", batch=4096, chunk=2048, repeats=8):
    env, reset, run_chunk = build(env_id, batch, chunk)
    key = jax.random.PRNGKey(0)
    k_reset, key = jax.random.split(key)
    obs, state = reset(jax.random.split(k_reset, batch))
    jax.block_until_ready(state.grid)

    # warmup/compile
    state, key, probe = run_chunk(state, key)
    jax.block_until_ready(probe)

    # steady-state: launch chunks back-to-back, one final sync
    t0 = time.perf_counter()
    probes = []
    for _ in range(repeats):
        state, key, probe = run_chunk(state, key)
        probes.append(probe)
    jax.block_until_ready(probes)
    dt = time.perf_counter() - t0
    return repeats * batch * chunk / dt


if __name__ == "__main__":
    rate = bench()
    print(
        json.dumps(
            {
                "metric": "doorkey8x8_env_steps_per_s_4096envs",
                "value": round(rate),
                "unit": "steps/s",
                "vs_baseline": round(rate / REFERENCE_DOORKEY_STEPS_PER_S, 2),
            }
        )
    )

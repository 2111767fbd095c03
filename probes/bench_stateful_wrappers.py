"""Chip throughput of the stateful-wrapper fast paths (round 5).

Measures the pooled auto-reset rate at B=4096 DoorKey-8x8 (packed obs)
through each _StatefulFastPath wrapper — ActionBonus, PositionBonus,
DirectionObsWrapper — against the unwrapped pooled rate from the same
process, with the same scan-chunk methodology as bench.py. Run
foreground on the chip (one TPU client at a time).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu import wrappers as W

ENV_ID = "MiniGrid-DoorKey-8x8-v0"
B = 4096
CHUNK = 1024
REPEATS = 3
POOL = 1024


def bench_pooled(make_w, packed=True):
    env = minigrid_tpu.make(ENV_ID)
    if packed:
        env = env.packed()
    w = make_w(env) if make_w is not None else env
    _, st = jax.jit(jax.vmap(w.reset_staggered))(
        jax.random.split(jax.random.PRNGKey(0), B))
    pool = w.make_pool(jax.random.PRNGKey(1), POOL)

    def run(st, key):
        key, ka, ks = jax.random.split(key, 3)
        actions = jax.random.randint(ka, (CHUNK, B), 0, 7)
        skeys = jax.vmap(lambda i: jax.random.fold_in(ks, i))(
            jnp.arange(CHUNK))

        def body(st, xs):
            keys = jax.random.split(xs[0], B)
            obs, st, r, te, tr, _ = w.step_autoreset_pooled(
                keys, st, xs[1], pool)
            o = obs["packed"] if isinstance(obs, dict) else obs
            return st, o.astype(jnp.int32).sum() + r.sum()

        st, probes = jax.lax.scan(body, st, (skeys, actions), unroll=8)
        return st, key, probes.sum()

    run = jax.jit(run, donate_argnums=(0,))
    st, key, p = run(st, jax.random.PRNGKey(2))
    jax.block_until_ready(p)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        st, key, p = run(st, key)
    jax.block_until_ready(p)
    return REPEATS * B * CHUNK / (time.perf_counter() - t0)


def main():
    out = {
        "unwrapped": round(bench_pooled(None)),
        "action_bonus": round(bench_pooled(W.ActionBonus)),
        "position_bonus": round(bench_pooled(W.PositionBonus)),
        "direction_obs": round(bench_pooled(
            lambda e: W.DirectionObsWrapper(e, type="slope"))),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

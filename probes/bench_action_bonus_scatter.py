"""A/B: ActionBonus fast-path visit update — dense one-hot accumulate
(production, wrappers/__init__.py _CountBonus._post_step) vs a flat
int32 per-row scatter-add.

The dense update adds a (B, W, H, 4, 7) bool one-hot (~7.3M lanes at
B=4096 DoorKey-8x8) every step; the alternative flattens the table to
(B, 1792) and scatter-adds one element per row. int32 scatter-adds are
exact on this backend (the round-5 narrow-dtype corruption hits
int8/uint8/bool only — RESULTS.md), so the variant is admissible; this
probe measures whether it is faster and cross-checks the resulting
count tables for equality at full batch. Run foreground on the chip.
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


def _post_step_scatter(self, counts, st, r, actions):
    n = counts.shape[0]
    p = self.params
    flat = counts.reshape(n, -1)
    idx = ((st.agent_pos[:, 0] * p.height + st.agent_pos[:, 1]) * 4
           + st.agent_dir) * 7 + actions
    rows = jnp.arange(n)
    flat = flat.at[rows, idx].add(1)
    visits = flat[rows, idx]
    return (r + self.scale / jnp.sqrt(visits.astype(jnp.float32)),
            flat.reshape(counts.shape))


def bench(post_step=None, steps=CHUNK, repeats=REPEATS, measure=True):
    env = minigrid_tpu.make(ENV_ID).packed()
    w = W.ActionBonus(env)
    if post_step is not None:
        w._post_step = post_step.__get__(w, W.ActionBonus)
    _, st = jax.jit(jax.vmap(w.reset_staggered))(
        jax.random.split(jax.random.PRNGKey(0), B))
    pool = w.make_pool(jax.random.PRNGKey(1), POOL)

    def run(st, key):
        key, ka, ks = jax.random.split(key, 3)
        actions = jax.random.randint(ka, (steps, B), 0, 7)
        skeys = jax.vmap(lambda i: jax.random.fold_in(ks, i))(
            jnp.arange(steps))

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
    jax.block_until_ready(p)
    if not measure:
        return st
    t0 = time.perf_counter()
    for _ in range(repeats):
        st, key, p = run(st, key)
    jax.block_until_ready(p)
    return repeats * B * steps / (time.perf_counter() - t0)


def main():
    # correctness: identical short deterministic run, compare count tables
    st_dense = bench(None, steps=256, measure=False)
    st_scat = bench(_post_step_scatter, steps=256, measure=False)
    agree = bool(jnp.array_equal(st_dense.wrapper, st_scat.wrapper))
    out = {
        "counts_agree_B4096": agree,
        "dense_onehot": round(bench(None)),
        "flat_scatter_add": round(bench(_post_step_scatter)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

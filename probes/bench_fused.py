"""Chip benchmark: Pallas fused rollout vs the XLA jit/vmap step path.

Usage: python -u probes/bench_fused.py [batch] [chunk] [repeats]
"""
import sys
import time

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.ops.fused_step import fused_rollout

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
T = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
R = int(sys.argv[3]) if len(sys.argv) > 3 else 6


def main():
    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0").packed()
    gen = jax.jit(jax.vmap(env._gen_grid))
    states = gen(jax.random.split(jax.random.PRNGKey(0), B))
    jax.block_until_ready(states.grid)
    print("layouts ready", flush=True)
    actions = jax.random.randint(jax.random.PRNGKey(1), (T, B), 0, 7)

    # fused kernel
    def run_fused(states, actions):
        st, obs, rew, te, tr = fused_rollout(env.params, states, actions,
                                             T_tile=64, native_layout=True)
        return st, obs.astype(jnp.int32).sum() + rew.sum()

    run_fused = jax.jit(run_fused)
    st, probe = run_fused(states, actions)
    jax.block_until_ready(probe)
    t0 = time.perf_counter()
    for _ in range(R):
        st, probe = run_fused(states, actions)
    jax.block_until_ready(probe)
    rate_f = R * B * T / (time.perf_counter() - t0)
    print(f"fused kernel: {rate_f/1e6:.1f}M env-steps/s", flush=True)

    # XLA scan path (pure step, same probe)
    def run_xla(state, key):
        def body(carry, xs):
            (state,) = carry
            k, a = xs
            keys = jax.random.split(k, B)
            obs, state, reward, term, trunc, _ = jax.vmap(env.step)(
                keys, state, a)
            return (state,), obs["packed"].astype(jnp.int32).sum() + reward.sum()

        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(T))
        (state,), probes = jax.lax.scan(body, (state,), (keys, actions),
                                        unroll=8)
        return state, probes.sum()

    run_xla = jax.jit(run_xla)
    st2, probe = run_xla(states, jax.random.PRNGKey(2))
    jax.block_until_ready(probe)
    t0 = time.perf_counter()
    for _ in range(R):
        st2, probe = run_xla(states, jax.random.PRNGKey(2))
    jax.block_until_ready(probe)
    rate_x = R * B * T / (time.perf_counter() - t0)
    print(f"xla step path: {rate_x/1e6:.1f}M env-steps/s "
          f"(fused/xla = {rate_f/rate_x:.3f})", flush=True)


if __name__ == "__main__":
    main()

"""Profile the BabyAI pure-step hot loop (verifier in the loop).

GoToObj pure step measures 82.3M env-steps/s vs DoorKey-8x8's 215.8M at
the same 8x8 grid — the delta is the instruction verifier + instr state
carried through the scan. This probe captures a jax.profiler trace of the
steady-state scan chunk and prints the op table (via probes/agg_trace.py)
to attribute the cost: verifier mask traffic vs step kernel vs obs.

Usage: python -u probes/profile_babyai_step.py [env_id] [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp

import minigrid_tpu

ENV_ID = sys.argv[1] if len(sys.argv) > 1 else "BabyAI-GoToObj-v0"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
CHUNK = 1024


def main():
    env = minigrid_tpu.make(ENV_ID).packed()
    gen = jax.jit(jax.vmap(env._gen_grid))
    t0 = time.perf_counter()
    states = gen(jax.random.split(jax.random.PRNGKey(0), BATCH))
    jax.block_until_ready(states.grid)
    print(f"gen compile+run: {time.perf_counter() - t0:.1f}s")

    step = jax.vmap(env.step)

    def run_chunk(state, key):
        k_act, k_step = jax.random.split(key)
        actions = jax.random.randint(k_act, (CHUNK, BATCH), 0, 7)
        step_keys = jax.vmap(lambda i: jax.random.fold_in(k_step, i))(
            jnp.arange(CHUNK))

        def body(s, xs):
            sk, act = xs
            obs, s2, *_ = step(jax.random.split(sk, BATCH), s, act)
            return s2, obs["packed"].sum()

        state, acc = jax.lax.scan(body, state, (step_keys, actions))
        return state, acc.sum()

    run = jax.jit(run_chunk, donate_argnums=0)
    t0 = time.perf_counter()
    states, acc = run(states, jax.random.PRNGKey(1))
    jax.block_until_ready(acc)
    print(f"chunk compile+run: {time.perf_counter() - t0:.1f}s")

    # steady-state rate
    t0 = time.perf_counter()
    reps = 4
    for i in range(reps):
        states, acc = run(states, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0
    print(f"rate: {reps * CHUNK * BATCH / dt / 1e6:.1f}M env-steps/s")

    outdir = f"/tmp/trace_{ENV_ID.replace('/', '_')}"
    with jax.profiler.trace(outdir):
        states, acc = run(states, jax.random.PRNGKey(99))
        jax.block_until_ready(acc)
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()

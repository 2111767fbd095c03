import time, sys
t0=time.perf_counter()
import jax
print(f"jax import {time.perf_counter()-t0:.1f}s; devices: {jax.devices()}", flush=True)
import jax.numpy as jnp
import minigrid_tpu
from bench import build
t0=time.perf_counter()
env, reset, run_chunk = build("MiniGrid-DoorKey-8x8-v0", 4096, 2048)
key = jax.random.PRNGKey(0)
k_reset, key = jax.random.split(key)
obs, state = reset(jax.random.split(k_reset, 4096))
jax.block_until_ready(state.grid)
print(f"reset compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
state, key, probe = run_chunk(state, key)
jax.block_until_ready(probe)
print(f"chunk compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
state, key, probe = run_chunk(state, key)
jax.block_until_ready(probe)
dt=time.perf_counter()-t0
print(f"steady chunk {dt:.3f}s -> {4096*2048/dt/1e6:.1f}M steps/s", flush=True)

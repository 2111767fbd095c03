import time
import jax
import jax.numpy as jnp
import minigrid_tpu
from minigrid_tpu.ops import fused_rollout

B, T, REPEATS = 4096, 512, 8
env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0")
keys = jax.random.split(jax.random.PRNGKey(0), B)
_, state = jax.jit(jax.vmap(env.reset))(keys)
actions = jax.random.randint(jax.random.PRNGKey(1), (T, B), 0, 7)
jax.block_until_ready((state.grid, actions))

# warmup/compile
st, rew, probe = fused_rollout(env, state, actions)
jax.block_until_ready(probe)
print("compiled; probe sum:", int(probe.sum()))

t0 = time.perf_counter()
st = state
for _ in range(REPEATS):
    st, rew, probe = fused_rollout(env, st, actions)
jax.block_until_ready(probe)
dt = time.perf_counter() - t0
steps = B * T * REPEATS
print(f"fused: {steps/dt/1e6:.1f}M env-steps/s  ({dt:.3f}s for {steps} steps)")

"""Probe: scan K PPO train steps inside one dispatch (fresh resets)."""
import sys
import time

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.models.actor_critic import ActorCritic, init_params
from minigrid_tpu.models.ppo import PPOConfig, make_optimizer, make_train_step

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B, T = 4096, 128

env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0").packed()
cfg = PPOConfig(num_envs=B, rollout_len=T)
model = ActorCritic()
opt = make_optimizer(cfg)
params = init_params(jax.random.PRNGKey(0), model=model, packed=True)
opt_state = opt.init(params)
obs, st = jax.jit(jax.vmap(env.reset_staggered))(
    jax.random.split(jax.random.PRNGKey(1), B))
step = make_train_step(env, model, cfg, opt, resets="fresh")


def train_many(params, opt_state, st, obs, key):
    def body(carry, _):
        params, opt_state, st, obs, key = carry
        params, opt_state, st, obs, key, m = step(
            params, opt_state, st, obs, key)
        return (params, opt_state, st, obs, key), m["loss"]

    (params, opt_state, st, obs, key), losses = jax.lax.scan(
        body, (params, opt_state, st, obs, key), None, length=K)
    return params, opt_state, st, obs, key, losses


tm = jax.jit(train_many, donate_argnums=(0, 1, 2, 3))
key = jax.random.PRNGKey(2)
out = tm(params, opt_state, st, obs, key)
jax.block_until_ready(out[5])
params, opt_state, st, obs, key, _ = out
R = 4
t0 = time.perf_counter()
for _ in range(R):
    params, opt_state, st, obs, key, losses = tm(params, opt_state, st, obs,
                                                 key)
jax.block_until_ready(losses)
rate = R * K * B * T / (time.perf_counter() - t0)
print(f"K={K}: {rate/1e6:.2f}M env-steps/s")

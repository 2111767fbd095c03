"""The fused Pallas rollout kernel (ops/fused_step.py) must reproduce the
jit/vmap step path bit-exactly: same packed observations, rewards,
terminations and final states for the core-dynamics envs, including
pickup/drop/toggle interaction chains. Runs in Pallas interpret mode on
the CPU test backend; the real-chip numbers live in RESULTS.md."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.ops.fused_step import fused_rollout


@pytest.mark.parametrize("env_id,actions_hint", [
    ("MiniGrid-Empty-8x8-v0", None),
    ("MiniGrid-DoorKey-8x8-v0", None),
    ("MiniGrid-DoorKey-5x5-v0", "interact"),
])
def test_fused_rollout_matches_step(env_id, actions_hint):
    env = minigrid_tpu.make(env_id).packed()
    B, T = 128, 16
    obs0, states = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B))
    if actions_hint == "interact":
        # bias toward interactions so pickup/toggle/drop paths execute
        actions = jax.random.choice(
            jax.random.PRNGKey(1),
            jnp.asarray([0, 1, 2, 2, 3, 4, 5, 5], jnp.int32), (T, B))
    else:
        actions = jax.random.randint(jax.random.PRNGKey(1), (T, B), 0, 7)

    new_states, obs, rew, te, tr = fused_rollout(
        env.params, states, actions, T_tile=8, interpret=True)

    # reference: scan of the vmapped jit step
    step = jax.jit(jax.vmap(env.step))
    st = states
    keys = jax.random.split(jax.random.PRNGKey(9), B)  # unused by core env
    for t in range(T):
        o, st, r, te_r, tr_r, _ = step(keys, st, actions[t])
        np.testing.assert_array_equal(
            np.asarray(obs[t]), np.asarray(o["packed"]),
            err_msg=f"{env_id} step {t} obs")
        np.testing.assert_allclose(np.asarray(rew[t]), np.asarray(r),
                                   rtol=1e-6, err_msg=f"step {t} reward")
        np.testing.assert_array_equal(np.asarray(te[t]), np.asarray(te_r))
        np.testing.assert_array_equal(np.asarray(tr[t]), np.asarray(tr_r))
    np.testing.assert_array_equal(np.asarray(new_states.grid),
                                  np.asarray(st.grid))
    np.testing.assert_array_equal(np.asarray(new_states.agent_pos),
                                  np.asarray(st.agent_pos))
    np.testing.assert_array_equal(np.asarray(new_states.agent_dir),
                                  np.asarray(st.agent_dir))
    np.testing.assert_array_equal(np.asarray(new_states.carrying),
                                  np.asarray(st.carrying))
    np.testing.assert_array_equal(np.asarray(new_states.step_count),
                                  np.asarray(st.step_count))

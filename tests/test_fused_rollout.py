"""Parity: the Pallas fused rollout kernel vs the XLA step/obs path.

The kernel (ops/fused_rollout.py) re-implements the transition
(core/step.py) fused with observation generation (core/obs.py +
core/visibility.py) with state resident in VMEM. These tests drive both
paths from identical batched states through identical action streams and
require cell-exact agreement on the final state and on the per-env
observation/reward accumulators (interpret mode: tests run on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.ops import fused_rollout, supports_fused_rollout

B, T = 1024, 16


def _xla_rollout(env, state, actions):
    step = jax.vmap(env.step)
    keys = jax.random.split(jax.random.PRNGKey(99), B)

    def body(carry, a):
        st, rew, probe = carry
        obs, st, r, term, trunc, _ = step(keys, st, a)
        probe = probe + obs["image"].astype(jnp.int32).sum(axis=(1, 2, 3))
        return (st, rew + r, probe), None

    init = (state, jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32))
    (st, rew, probe), _ = jax.lax.scan(body, init, actions)
    return st, rew, probe


@pytest.mark.parametrize(
    "env_id",
    ["MiniGrid-DoorKey-8x8-v0", "MiniGrid-Empty-8x8-v0"],
)
def test_fused_rollout_parity(env_id):
    env = minigrid_tpu.make(env_id)
    assert supports_fused_rollout(env, B)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, state = jax.jit(jax.vmap(env.reset))(keys)
    # biased action stream: over-sample interactions so pickup/toggle/drop
    # paths are exercised against doors, keys and walls
    actions = jax.random.choice(
        jax.random.PRNGKey(1),
        jnp.arange(7),
        shape=(T, B),
        p=jnp.asarray([0.1, 0.1, 0.35, 0.15, 0.1, 0.15, 0.05]),
    ).astype(jnp.int32)

    st_ref, rew_ref, probe_ref = jax.jit(
        lambda s, a: _xla_rollout(env, s, a)
    )(state, actions)
    st_f, rew_f, probe_f = fused_rollout(env, state, actions, interpret=True)

    np.testing.assert_array_equal(np.asarray(st_f.grid), np.asarray(st_ref.grid))
    np.testing.assert_array_equal(
        np.asarray(st_f.agent_pos), np.asarray(st_ref.agent_pos)
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.agent_dir), np.asarray(st_ref.agent_dir)
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.carrying), np.asarray(st_ref.carrying)
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.step_count), np.asarray(st_ref.step_count)
    )
    np.testing.assert_array_equal(
        np.asarray(st_f.terminated), np.asarray(st_ref.terminated)
    )
    np.testing.assert_array_equal(np.asarray(probe_f), np.asarray(probe_ref))
    np.testing.assert_allclose(
        np.asarray(rew_f), np.asarray(rew_ref), rtol=0, atol=1e-5
    )


def test_supports_gating():
    env = minigrid_tpu.make("MiniGrid-Dynamic-Obstacles-8x8-v0")
    assert not supports_fused_rollout(env, B)  # custom pre-step dynamics
    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0")
    assert not supports_fused_rollout(env, 100)  # partial tile

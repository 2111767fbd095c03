"""Pixel-exact rendering parity vs the reference renderer."""

import numpy as np
import pytest

from tests.ref_oracle import make_reference, state_from_reference

import jax

import minigrid_tpu
from minigrid_tpu.render import get_frame


@pytest.mark.parametrize("env_id", [
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-DoorKey-8x8-v0",
    "MiniGrid-LavaGapS7-v0",
    "MiniGrid-Fetch-8x8-N3-v0",
    "MiniGrid-KeyCorridorS3R3-v0",
])
@pytest.mark.parametrize("tile_size", [8, 32])
def test_full_render_matches(env_id, tile_size):
    ref = make_reference(env_id)
    ref.reset(seed=3)
    env = minigrid_tpu.make(env_id)
    state = state_from_reference(ref, env, jax.random.PRNGKey(0))

    want = ref.get_frame(highlight=True, tile_size=tile_size)
    got = np.asarray(get_frame(env.params, state, highlight=True,
                               tile_size=tile_size))
    np.testing.assert_array_equal(got, want)

    want = ref.get_frame(highlight=False, tile_size=tile_size)
    got = np.asarray(get_frame(env.params, state, highlight=False,
                               tile_size=tile_size))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("env_id", [
    "MiniGrid-DoorKey-8x8-v0",
    "MiniGrid-LavaCrossingS9N2-v0",
])
def test_pov_render_matches(env_id):
    ref = make_reference(env_id)
    ref.reset(seed=5)
    env = minigrid_tpu.make(env_id)
    state = state_from_reference(ref, env, jax.random.PRNGKey(0))
    # walk a bit so the agent carries/faces things
    for a in [2, 1, 2, 3, 0]:
        ref.step(a)
        _, state, *_ = jax.jit(env.step)(jax.random.PRNGKey(1), state, a)

    want = ref.get_frame(tile_size=16, agent_pov=True)
    got = np.asarray(get_frame(env.params, state, tile_size=16, agent_pov=True))
    np.testing.assert_array_equal(got, want)

"""Structural validity of our jittable BabyAI level generation."""

import jax
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.core.mission import detokenize
from tests.test_generation import batch_reset, reachable


def test_gotoredball_structure():
    _, _, states = batch_reset("BabyAI-GoToRedBall-v0", n=32)
    for b in range(32):
        grid = states.grid[b]
        red_balls = (grid[..., 0] == C.BALL) & (grid[..., 1] == 0)
        assert red_balls.any()
        assert reachable(grid, states.agent_pos[b], red_balls)


def test_gotoredballgrey_distractors_grey():
    _, _, states = batch_reset("BabyAI-GoToRedBallGrey-v0", n=32)
    for b in range(32):
        grid = states.grid[b]
        objs = (grid[..., 0] == C.BALL) | (grid[..., 0] == C.KEY) \
            | (grid[..., 0] == C.BOX)
        colors = grid[..., 1][objs]
        # exactly one red ball, everything else grey
        assert (colors == 0).sum() == 1
        assert ((colors == 0) | (colors == C.COLOR_TO_IDX["grey"])).all()


def test_unlock_levels_have_matching_keys():
    for env_id in ["BabyAI-UnlockLocal-v0", "BabyAI-UnlockPickup-v0",
                   "BabyAI-UnlockToUnlock-v0"]:
        _, _, states = batch_reset(env_id, n=16)
        grids = states.grid
        for b in range(16):
            types, colors, dstates = (grids[b][..., 0], grids[b][..., 1],
                                      grids[b][..., 2])
            locked = np.argwhere((types == C.DOOR) & (dstates == C.LOCKED))
            assert len(locked) >= 1, env_id
            for lx, ly in locked:
                assert ((types == C.KEY) & (colors == colors[lx, ly])).any() \
                    or ((grids[b][..., 3] == C.KEY)
                        & (grids[b][..., 4] == colors[lx, ly])).any(), env_id


@pytest.mark.nightly
def test_missions_detokenize_across_levels():
    # nightly: the MiniBossLevel/PickupLoc reset compiles dominate the
    # default tier (~45s); surface realization is default-tier-covered by
    # test_babyai.test_surface_matches_reference
    ids = ["BabyAI-MiniBossLevel-v0", "BabyAI-PickupLoc-v0"]
    for env_id in ids:
        env = minigrid_tpu.make(env_id)
        # batch 8 + key 0 shares the compiled program with
        # test_dynamic_max_steps_scales (identical HLO -> one compile)
        _, states = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(0), 8))
        for b in range(4):
            text = detokenize(np.asarray(states.mission[b]))
            assert len(text.split()) >= 3, f"{env_id}: {text!r}"
            for frag in ["go to", "pick up", "open", "put"]:
                if text.startswith(frag):
                    break
            else:
                raise AssertionError(f"{env_id}: {text!r}")


def test_dynamic_max_steps_scales():
    env = minigrid_tpu.make("BabyAI-MiniBossLevel-v0")
    _, states = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 8))
    ms = np.asarray(states.max_steps if hasattr(states, "max_steps")
                    else states.extra["max_steps"])
    nav = 5 * 5 * 2 * 2
    assert set(np.unique(ms)).issubset({nav, 2 * nav, 3 * nav, 4 * nav,
                                        5 * nav, 6 * nav, 7 * nav, 8 * nav})


def test_putnext_carrying_starts_with_object():
    env = minigrid_tpu.make("BabyAI-PutNextS5N2Carrying-v0")
    _, states = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 16))
    carrying = np.asarray(states.carrying)
    assert (carrying[:, 0] != C.EMPTY).all()
    carried_flags = np.asarray(states.extra["instr"].descs.carried)
    assert carried_flags[:, 0].all(), "move desc must track the carried obj"

"""Directed parity tests for object interactions (pickup/drop/toggle).

Crafts layouts inside the reference env, syncs them into our state, and
drives both through scripted action sequences exercising every interaction
rule: key pickup, locked-door unlock (right/wrong key), open/close, box
reveal (with/without contents), drop restrictions, lava death, goal reward.
"""

import numpy as np
import pytest

from tests.ref_oracle import (
    add_reference_to_path,
    encode_carrying,
    encode_with_contents,
    make_reference,
    state_from_reference,
)

add_reference_to_path()

from minigrid.core.world_object import Ball, Box, Door, Key, Lava  # noqa: E402

import jax  # noqa: E402

import minigrid_tpu  # noqa: E402
from minigrid_tpu.core.actions import Actions  # noqa: E402

A = Actions


def run_lockstep(ref, actions, seed=0):
    env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
    env = env.replace_params(see_through_walls=False)
    key = jax.random.PRNGKey(seed)
    state = state_from_reference(ref, env, key)
    step = jax.jit(env.step)
    for t, a in enumerate(actions):
        ref_obs, ref_rew, ref_term, ref_trunc, _ = ref.step(int(a))
        key, sub = jax.random.split(key)
        obs, state, rew, term, trunc, _ = step(sub, state, int(a))
        np.testing.assert_array_equal(
            np.asarray(obs["image"]), ref_obs["image"], err_msg=f"t={t} a={a}"
        )
        np.testing.assert_array_equal(
            np.asarray(state.grid), encode_with_contents(ref.grid), f"t={t}"
        )
        np.testing.assert_array_equal(
            np.asarray(state.carrying), encode_carrying(ref.carrying), f"t={t}"
        )
        np.testing.assert_allclose(float(rew), float(ref_rew), rtol=1e-5)
        assert bool(term) == bool(ref_term) and bool(trunc) == bool(ref_trunc)
    return state


def fresh_ref():
    ref = make_reference("MiniGrid-Empty-8x8-v0")
    ref.reset(seed=0)
    # agent at (1,1) facing right (+x); clear a deterministic stage
    ref.see_through_walls = False
    return ref


def test_key_and_locked_door():
    ref = fresh_ref()
    ref.put_obj(Key("yellow"), 2, 1)
    ref.put_obj(Door("yellow", is_locked=True), 4, 1)
    actions = [
        A.pickup,   # grab key
        A.pickup,   # no-op: nothing in front
        A.forward, A.forward,  # walk to door
        A.toggle,   # unlock+open
        A.toggle,   # close again (now unlocked)
        A.toggle,   # reopen
        A.forward,  # through the door
        A.drop,     # drop key beyond
    ]
    run_lockstep(ref, actions)


def test_wrong_key_does_not_unlock():
    ref = fresh_ref()
    ref.put_obj(Key("blue"), 2, 1)
    ref.put_obj(Door("yellow", is_locked=True), 4, 1)
    run_lockstep(ref, [A.pickup, A.forward, A.forward, A.toggle, A.forward])


def test_box_reveals_contents_and_empty_box():
    ref = fresh_ref()
    ref.put_obj(Box("purple", contains=Key("green")), 2, 1)
    ref.put_obj(Box("red"), 2, 3)
    actions = [
        A.toggle,   # box -> green key appears
        A.pickup,   # pick the revealed key
        A.right,    # face down
        A.forward,  # (2 is blocked? no: cell (1,2) empty) move down
        A.forward,
        A.left,     # face right towards (2,3)... adjust below
    ]
    run_lockstep(ref, actions)


def test_empty_box_toggle_disappears():
    ref = fresh_ref()
    ref.put_obj(Box("red"), 2, 1)
    run_lockstep(ref, [A.toggle, A.forward, A.forward])


def test_drop_rules_and_ball_carry():
    ref = fresh_ref()
    ref.put_obj(Ball("blue"), 2, 1)
    ref.put_obj(Ball("green"), 3, 1)
    actions = [
        A.pickup,          # carry blue ball
        A.pickup,          # can't pick second while carrying
        A.drop,            # can't drop: green ball in front? (front is (2,1) now empty) -> drops
        A.pickup,          # pick again
        A.forward,         # blocked? front (2,1) empty after pickup -> move
        A.drop,            # front (3,1) has green ball -> drop refused
        A.left, A.drop,    # face up: wall? (2,0) wall -> refused
        A.right, A.right, A.drop,  # face down (2,2) empty -> drop ok
    ]
    run_lockstep(ref, actions)


def test_lava_death_and_goal_reward():
    ref = fresh_ref()
    ref.put_obj(Lava(), 2, 1)
    run_lockstep(ref, [A.forward])

    ref2 = fresh_ref()
    run_lockstep(
        ref2,
        [A.forward] * 5 + [A.right] + [A.forward] * 5,  # to goal at (6,6)
    )


def test_done_action_is_noop():
    ref = fresh_ref()
    run_lockstep(ref, [A.done, A.forward, A.done])


@pytest.mark.parametrize("seed", range(4))
def test_random_interaction_soup(seed):
    """Dense random rollouts on a cluttered stage hit many rule branches."""
    ref = fresh_ref()
    ref.put_obj(Key("yellow"), 2, 1)
    ref.put_obj(Door("yellow", is_locked=True), 4, 1)
    ref.put_obj(Box("green", contains=Ball("purple")), 1, 3)
    ref.put_obj(Ball("red"), 3, 3)
    ref.put_obj(Lava(), 5, 5)
    rng = np.random.default_rng(seed)
    # bias towards interaction actions
    actions = rng.choice(
        [A.left, A.right, A.forward, A.forward, A.pickup, A.drop, A.toggle],
        size=120,
    )
    run_lockstep(ref, actions, seed=seed)

"""Oracle-bot solvability suite (reference tests/test_baby_ai_bot.py:24-58):
the bot — planning only from accumulated partial observations — must solve
every registered BabyAI level within the reference's 240-step budget,
retrying failed seeds. This is the end-to-end proof that generation, the
verifier, the observation kernel and dynamics fit together on our own
generated levels, and doubles as registry conformance for the BabyAI ids.

Tiering: compiling ~90 distinct BabyAI reset programs dominates the cost,
so the default tier runs a representative cut across every level family and
the ``nightly`` tier runs the full catalog.
"""

import jax
import pytest

import minigrid_tpu
from minigrid_tpu.utils.baby_ai_bot import BabyAIBot

# reference broken_bonus_envs (tests/test_baby_ai_bot.py:9-14)
BROKEN_BONUS_ENVS = {
    "BabyAI-PutNextS5N2Carrying-v0",
    "BabyAI-PutNextS6N3Carrying-v0",
    "BabyAI-PutNextS7N4Carrying-v0",
    "BabyAI-KeyInBox-v0",
}

ALL_LEVELS = [
    i for i in minigrid_tpu.registered_ids()
    if i.startswith("BabyAI") and i not in BROKEN_BONUS_ENVS
]

# representative cut across the level families (default tier); the nightly
# tier runs every other id
FAST_LEVELS = [
    "BabyAI-GoToRedBallGrey-v0",
    "BabyAI-GoToLocal-v0",
    "BabyAI-GoToObjDoor-v0",
    "BabyAI-OpenDoorsOrderN4-v0",
    "BabyAI-PutNextLocal-v0",
    "BabyAI-UnlockLocal-v0",
    "BabyAI-BlockedUnlockPickup-v0",
    "BabyAI-UnlockToUnlock-v0",
    "BabyAI-ActionObjDoor-v0",
    "BabyAI-KeyCorridorS3R3-v0",
    # densest object packing in the catalog (18 objs, two rooms): exercises
    # the BFS backtrack + unblock planning (regression: _first_step
    # descending through marked object cells deadlocked the bot here)
    "BabyAI-MoveTwoAcrossS8N9-v0",
    # SynthLoc (the LevelGen grammar's bot exercise) lives in the nightly
    # tier: its reset compile alone is ~2 min cold and the grammar is
    # already compiled+lockstep-checked in the default tier by
    # test_babyai.py (SynthLoc/MiniBossLevel lockstep + surface tests).
]

MAX_SEED_TRIES = 8
STEP_BUDGET = 240  # the reference budget (test_baby_ai_bot.py:37)


def solve_with_bot(env_id):
    env = minigrid_tpu.make(env_id)
    step = jax.jit(env.step)
    reset = jax.jit(env.reset)
    for seed in range(MAX_SEED_TRIES):
        _, state = reset(jax.random.PRNGKey(seed))
        bot = BabyAIBot(env)
        for t in range(STEP_BUDGET):
            action = bot.replan(state)
            _, state, reward, term, trunc, _ = step(
                jax.random.PRNGKey(t), state, action)
            if bool(term):
                if float(reward) > 0:
                    return  # solved
                break
            if bool(trunc):
                break
    raise AssertionError(
        f"bot failed to solve {env_id} in {MAX_SEED_TRIES} seeds")


@pytest.mark.parametrize("env_id", FAST_LEVELS)
def test_bot_solves(env_id):
    solve_with_bot(env_id)


@pytest.mark.nightly
@pytest.mark.parametrize("env_id", sorted(set(ALL_LEVELS) - set(FAST_LEVELS)))
def test_bot_solves_full_catalog(env_id):
    solve_with_bot(env_id)


def test_demo_generation():
    """Bot demonstrations: successful, verifier-approved, replayable."""
    from minigrid_tpu.utils.demos import generate_demos

    env = minigrid_tpu.make("BabyAI-GoToRedBallGrey-v0")
    demos = generate_demos(env, num_episodes=3, max_steps=240)
    assert demos.image.shape[0] == 3 and demos.mask.any(1).all()
    assert (demos.length >= 1).all()
    # replaying a demo's actions from its seed reproduces success
    step = jax.jit(env.step)
    _, state = jax.jit(env.reset)(jax.random.PRNGKey(int(demos.seed[0])))
    for t in range(int(demos.length[0])):
        _, state, r, te, tr, _ = step(
            jax.random.PRNGKey(t), state, int(demos.action[0, t]))
    assert bool(te) and float(r) > 0

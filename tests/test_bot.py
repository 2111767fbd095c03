"""Oracle-bot solvability suite (the reference tests/test_baby_ai_bot.py
pattern): the bot must solve every listed level, retrying failed seeds —
this is the end-to-end proof that generation, verifier and dynamics fit
together on our own generated levels."""

import jax
import pytest

import minigrid_tpu
from minigrid_tpu.utils.baby_ai_bot import BabyAIBot

# Representative cut across all level families. KeyInBox is excluded like
# the reference's broken_bonus_envs (its key may be unreachable by design).
LEVELS = [
    "BabyAI-GoToRedBallGrey-v0",
    "BabyAI-GoToRedBall-v0",
    "BabyAI-GoToObj-v0",
    "BabyAI-GoToLocal-v0",
    "BabyAI-GoToObjDoor-v0",
    "BabyAI-Open-v0",
    "BabyAI-OpenRedDoor-v0",
    "BabyAI-OpenDoor-v0",
    "BabyAI-OpenTwoDoors-v0",
    "BabyAI-OpenDoorsOrderN4-v0",
    "BabyAI-Pickup-v0",
    "BabyAI-PickupLoc-v0",
    "BabyAI-PickupDist-v0",
    "BabyAI-PickupAbove-v0",
    "BabyAI-PutNextLocal-v0",
    "BabyAI-PutNextS5N2-v0",
    "BabyAI-UnlockLocal-v0",
    "BabyAI-UnlockPickup-v0",
    "BabyAI-BlockedUnlockPickup-v0",
    "BabyAI-UnlockToUnlock-v0",
    "BabyAI-ActionObjDoor-v0",
    "BabyAI-FindObjS5-v0",
    "BabyAI-KeyCorridorS3R3-v0",
    "BabyAI-OneRoomS8-v0",
    "BabyAI-Synth-v0",
    "BabyAI-SynthLoc-v0",
]

MAX_SEED_TRIES = 5
STEP_BUDGET = 600


@pytest.mark.parametrize("env_id", LEVELS)
def test_bot_solves(env_id):
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

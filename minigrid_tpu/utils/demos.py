"""Expert demonstration generation with the oracle bot.

The reference bot's stated purpose is "to generate demonstrations"
(``/root/reference/minigrid/utils/baby_ai_bot.py`` docstring /
tests/test_baby_ai_bot.py:26-29) but the reference ships no generator;
this module provides one over the functional envs: episodes are driven by
:class:`~minigrid_tpu.utils.baby_ai_bot.BabyAIBot` (partial-observation
planning, so demonstrations reflect what an agent could actually perceive)
and returned as fixed-shape arrays ready for behavioral cloning — stacked,
padded trajectories of observations, actions and masks.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax

from minigrid_tpu.utils.baby_ai_bot import BabyAIBot


class DemoBatch(NamedTuple):
    """Padded demonstration set. N episodes, T = longest episode."""

    image: np.ndarray     # (N, T, V, V, 3) uint8
    direction: np.ndarray  # (N, T) int32
    mission: np.ndarray   # (N, L) int32 token ids (constant per episode)
    action: np.ndarray    # (N, T) int32
    mask: np.ndarray      # (N, T) bool — valid timesteps
    length: np.ndarray    # (N,) int32
    seed: np.ndarray      # (N,) int32 — the successful layout seeds


def generate_demos(env, num_episodes: int, start_seed: int = 0,
                   max_steps: int = 240, max_seed_tries: int = 50):
    """Collect ``num_episodes`` successful bot episodes.

    Seeds count up from ``start_seed``; unsolved seeds are skipped (the
    reference bot-test retry pattern, tests/test_baby_ai_bot.py:35-56).
    Raises if the seed budget runs out first.
    """
    step = jax.jit(env.step)
    reset = jax.jit(env.reset)

    episodes = []
    seed = start_seed
    tries = 0
    while len(episodes) < num_episodes:
        if tries >= max_seed_tries + num_episodes:
            raise RuntimeError(
                f"exhausted {tries} seeds for {len(episodes)}/{num_episodes}"
                " demos")
        tries += 1
        obs, state = reset(jax.random.PRNGKey(seed))
        bot = BabyAIBot(env)
        images, dirs, actions = [], [], []
        solved = False
        for t in range(max_steps):
            action = bot.replan(state)
            images.append(np.asarray(obs["image"]))
            dirs.append(int(obs["direction"]))
            actions.append(int(action))
            obs, state, reward, term, trunc, _ = step(
                jax.random.PRNGKey(t), state, action)
            if bool(term):
                solved = float(reward) > 0
                break
            if bool(trunc):
                break
        if solved:
            episodes.append((images, dirs, actions,
                             np.asarray(state.mission), seed))
        seed += 1

    T = max(len(e[0]) for e in episodes)
    N = num_episodes
    V = env.params.view_size
    batch = DemoBatch(
        image=np.zeros((N, T, V, V, 3), np.uint8),
        direction=np.zeros((N, T), np.int32),
        mission=np.stack([e[3] for e in episodes]).astype(np.int32),
        action=np.zeros((N, T), np.int32),
        mask=np.zeros((N, T), bool),
        length=np.asarray([len(e[0]) for e in episodes], np.int32),
        seed=np.asarray([e[4] for e in episodes], np.int32),
    )
    for i, (images, dirs, actions, _, _) in enumerate(episodes):
        L = len(images)
        batch.image[i, :L] = np.stack(images)
        batch.direction[i, :L] = dirs
        batch.action[i, :L] = actions
        batch.mask[i, :L] = True
    return batch

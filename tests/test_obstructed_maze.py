"""ObstructedMaze statistical solvability suite
(reference tests/test_obstructed_maze.py:30-66).

Unsolvable layout = the blue-ball room has no door whose key is inside any
box on the map (a blocker ball overwrote the key box). v1 variants place
every door+blocker before any key, so their unsolvable rate must be exactly
0 over 10,000 resets; the v0 variants carry the documented failure rates
(2Dlhb/1Q: 1/15, 2Q: 1/30, Full: 0 — covering in Full never removes the
last exit key).

Resets are vmapped on device; the solvability analysis is vectorized numpy
over the batched state arrays, so 10,000 resets cost one compile plus a few
seconds of execution.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.core import constants as C

ROOM_SIZE = 6  # all ObstructedMaze variants (envs/obstructedmaze.py:35)
BLUE = C.COLOR_TO_IDX["blue"]

CASES = [
    # (id base, expected v0 unsolvable rate)
    ("MiniGrid-ObstructedMaze-2Dlhb", 1 / 15),
    ("MiniGrid-ObstructedMaze-1Q", 1 / 15),
    ("MiniGrid-ObstructedMaze-2Q", 1 / 30),
    ("MiniGrid-ObstructedMaze-Full", 0.0),
]


def unsolvable_rate(env_id: str, n: int, chunk: int = 1000) -> float:
    env = minigrid_tpu.make(env_id)
    reset_states = jax.jit(jax.vmap(lambda k: env.reset(k)[1].grid))
    S = ROOM_SIZE

    unsolvable = 0
    for c in range(n // chunk):
        keys = jax.random.split(jax.random.PRNGKey(c), chunk)
        g = np.asarray(reset_states(keys))  # (B, W, H, 5)
        types, colors = g[..., 0], g[..., 1]
        cont_t, cont_c = g[..., 3], g[..., 4]
        B, W, H = types.shape

        # the quest ball's room (reference find_ball_room)
        ball = (types == C.BALL) & (colors == BLUE)
        # v0 covering can also delete the quest ball? no - blockers are
        # green; exactly one blue ball exists per layout
        assert (ball.reshape(B, -1).sum(1) == 1).all()
        pos = ball.reshape(B, -1).argmax(1)
        bx, by = pos // H, pos % H
        ri, rj = (bx - 1) // (S - 1), (by - 1) // (S - 1)
        x0, y0 = ri * (S - 1), rj * (S - 1)
        x1, y1 = x0 + S - 1, y0 + S - 1

        xs = np.arange(W)[None, :]
        ys = np.arange(H)[None, :]
        in_x = (xs >= x0[:, None]) & (xs <= x1[:, None])
        in_y = (ys >= y0[:, None]) & (ys <= y1[:, None])
        edge_x = (xs == x0[:, None]) | (xs == x1[:, None])
        edge_y = (ys == y0[:, None]) | (ys == y1[:, None])
        border = (edge_x[:, :, None] & in_y[:, None, :]) | (
            in_x[:, :, None] & edge_y[:, None, :])

        room_doors = (types == C.DOOR) & border
        solvable = np.zeros(B, bool)
        for color in range(C.NUM_COLORS):
            has_door = (room_doors & (colors == color)).any((1, 2))
            boxed_key = ((types == C.BOX) & (cont_t == C.KEY)
                         & (cont_c == color)).any((1, 2))
            solvable |= has_door & boxed_key
        unsolvable += int((~solvable).sum())
    return unsolvable / n


@pytest.mark.nightly
@pytest.mark.parametrize("base_id", [c[0] for c in CASES])
def test_v1_always_solvable(base_id):
    """0% unsolvable over 10,000 resets (reference :44-46)."""
    assert unsolvable_rate(base_id + "-v1", 10_000) == 0.0


@pytest.mark.nightly
@pytest.mark.parametrize("base_id,expected", CASES)
def test_v0_failure_rates(base_id, expected):
    """The v0 covering-bug rates match the documented probabilities
    (reference main(), :49-66) within a 4-sigma binomial band."""
    n = 10_000
    rate = unsolvable_rate(base_id + "-v0", n)
    sigma = (max(expected, 1e-9) * (1 - expected) / n) ** 0.5
    tol = 4 * sigma + 1e-3
    assert abs(rate - expected) <= tol, (
        f"{base_id}-v0: measured {rate:.4f}, expected {expected:.4f}±{tol:.4f}")


def test_v1_small_sample():
    """Default-tier smoke at 1,000 resets per variant."""
    assert unsolvable_rate("MiniGrid-ObstructedMaze-2Dlhb-v1", 1_000) == 0.0

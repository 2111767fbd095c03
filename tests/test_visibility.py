"""Bit-exactness of the vectorized visibility kernel vs the reference sweep.

The oracle below re-states the reference ``Grid.process_vis`` algorithm
(minigrid/core/grid.py:291-328) directly on a boolean transparency array; the
JAX kernel must match it on every input.
"""

import itertools

import jax
import numpy as np
import pytest

from minigrid_tpu.core.visibility import process_vis


def sweep_oracle(transparent: np.ndarray, agent_x: int) -> np.ndarray:
    """Reference occlusion sweep on a (V, V) [x, y] transparency array."""
    w, h = transparent.shape
    mask = np.zeros((w, h), dtype=bool)
    mask[agent_x, h - 1] = True
    for j in reversed(range(h)):
        for i in range(w - 1):
            if not (mask[i, j] and transparent[i, j]):
                continue
            mask[i + 1, j] = True
            if j > 0:
                mask[i + 1, j - 1] = True
                mask[i, j - 1] = True
        for i in reversed(range(1, w)):
            if not (mask[i, j] and transparent[i, j]):
                continue
            mask[i - 1, j] = True
            if j > 0:
                mask[i - 1, j - 1] = True
                mask[i, j - 1] = True
    return mask


@pytest.mark.parametrize("v", [3, 5, 7])
def test_random_grids_match(v):
    kernel = jax.jit(lambda t: process_vis(t, v // 2))
    rng = np.random.default_rng(0)
    for density in [0.0, 0.1, 0.3, 0.5, 0.8, 1.0]:
        for _ in range(40):
            trans = rng.random((v, v)) >= density
            got = np.asarray(kernel(trans))
            want = sweep_oracle(trans, v // 2)
            np.testing.assert_array_equal(got, want)


def test_exhaustive_3x3():
    kernel = jax.jit(lambda t: process_vis(t, 1))
    for bits in itertools.product([False, True], repeat=9):
        trans = np.array(bits).reshape(3, 3)
        np.testing.assert_array_equal(
            np.asarray(kernel(trans)), sweep_oracle(trans, 1)
        )


def test_all_transparent_sees_everything():
    v = 7
    mask = np.asarray(process_vis(np.ones((v, v), bool), v // 2))
    assert mask.all()

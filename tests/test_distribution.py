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
    ("MiniGrid-Dynamic-Obstacles-8x8-v0", 10_000),
    ("BabyAI-GoToLocal-v0", 5_000),
    ("BabyAI-BossLevel-v0", 2_000),
])
def test_generation_distribution(env_id, n):
    compare(env_id, n)


@pytest.mark.nightly
def test_pooled_autoreset_reset_distribution():
    """Layouts entered through the pooled auto-reset path (broadcast-row
    mode, pool refreshed every chunk) match the reference's reset()
    distribution — the chi-square guard VERDICT r2 asked for on the fast
    training path. One sample per step (the first finishing env) keeps
    samples independent across pool draws."""
    import jax.numpy as jnp

    import minigrid_tpu
    from minigrid_tpu.envs.base import make_layout_pool, refresh_layout_pool

    env_id = "MiniGrid-DoorKey-5x5-v0"
    env = minigrid_tpu.make(env_id).replace_params(max_steps=8)
    B, T, CHUNKS = 128, 160, 8
    key = jax.random.PRNGKey(0)
    pool = make_layout_pool(env, key, 512)
    obs, st = jax.jit(jax.vmap(env.reset_staggered))(
        jax.random.split(jax.random.PRNGKey(1), B))

    def chunk(st, pool, ck):
        def body(carry, k):
            (st,) = carry
            keys = jax.random.split(k, B)
            acts = jax.random.randint(jax.random.fold_in(k, 1), (B,), 0, 7)
            _, st2, r, te, tr, _ = env.step_autoreset_pooled(
                keys, st, acts, pool)
            done = te | tr
            b = jnp.argmax(done)
            sample = (st2.grid[b, ..., 0], st2.grid[b, ..., 1],
                      st2.agent_pos[b], st2.agent_dir[b], done.any())
            return (st2,), sample

        (st,), samples = jax.lax.scan(
            body, (st,), jax.random.split(ck, T))
        return st, samples

    chunk = jax.jit(chunk)
    types, colors, pos, dirs = [], [], [], []
    for c in range(CHUNKS):
        st, (ts, cs, ps, ds, ok) = chunk(st, pool, jax.random.fold_in(
            jax.random.PRNGKey(2), c))
        ok = np.asarray(ok)
        types.append(np.asarray(ts)[ok])
        colors.append(np.asarray(cs)[ok])
        pos.append(np.asarray(ps)[ok])
        dirs.append(np.asarray(ds)[ok])
        pool = refresh_layout_pool(env, jax.random.fold_in(key, c + 1),
                                   pool)
    ours = occupancy_counts(np.concatenate(types), np.concatenate(colors),
                            np.concatenate(pos), np.concatenate(dirs))
    n = sum(t.shape[0] for t in types)
    assert n >= 500, f"too few reset samples collected: {n}"
    ref = occupancy_counts(*ref_sample(env_id, n))
    failures = []
    for k in sorted(set(ours) & set(ref)):
        p = chi2_two_sample(ours[k], ref[k])
        if p < P_THRESHOLD:
            failures.append((k, p))
    assert not failures, f"pooled reset distribution mismatch: {failures}"


@pytest.mark.nightly
def test_dynamic_obstacles_step_dynamics():
    """The one piece of IN-EPISODE randomness: obstacle re-placement each
    step (reference envs/dynamicobstacles.py:136-165). Lockstep parity
    cannot cover it (RNG orders differ), so from a layout matched to the
    reference this compares, across seed ensembles: (a) the one-step
    obstacle displacement distribution over the 3x3 neighborhood, and
    (b) collision/termination statistics under a shared action stream."""
    import copy

    from tests.ref_oracle import make_reference, state_from_reference

    import jax.numpy as jnp

    env_id = "MiniGrid-Dynamic-Obstacles-8x8-v0"
    ref = make_reference(env_id)
    ref.reset(seed=5)
    env = minigrid_tpu.make(env_id)
    base = state_from_reference(ref, env, jax.random.PRNGKey(0))
    old = np.asarray(base.extra["obstacles"])  # (n_obst, 2)

    # --- (a) one-step displacement distribution -------------------------
    N = 3000
    step_obs_pos = jax.jit(jax.vmap(
        lambda k: env.step(k, base, 0)[1].extra["obstacles"]))
    new_pos = np.asarray(step_obs_pos(
        jax.random.split(jax.random.PRNGKey(1), N)))
    disp_ours = (new_pos - old[None]).reshape(-1, 2)

    ref_disp = []
    for i in range(N):
        r = copy.deepcopy(ref)
        r._np_random = np.random.default_rng(10_000 + i)
        r.step(0)
        for o, op in zip(r.obstacles, old):
            ref_disp.append(np.asarray(o.cur_pos) - op)
    disp_ref = np.stack(ref_disp)

    def disp_counts(d):
        assert np.abs(d).max() <= 1
        return np.bincount((d[:, 0] + 1) * 3 + (d[:, 1] + 1), minlength=9)

    p = chi2_two_sample(disp_counts(disp_ours), disp_counts(disp_ref))
    assert p >= P_THRESHOLD, f"displacement distribution mismatch p={p}"

    # --- (b) collision/termination under a shared action stream ---------
    T, M = 25, 800
    actions = np.random.default_rng(3).integers(0, 3, size=T)
    acts = jnp.asarray(actions)

    def run_ours(key):
        def body(carry, a):
            st, done_t, hit, key = carry
            key, sub = jax.random.split(key)
            _, st2, rew, term, trunc, _ = env.step(sub, st, a)
            alive = done_t < 0
            newly = alive & (term | trunc)
            done_t = jnp.where(newly, st2.step_count - 1, done_t)
            hit = hit | (newly & (rew < 0))
            st = jax.tree.map(
                lambda x, y: jnp.where(alive, y, x), st, st2)
            return (st, done_t, hit, key), None

        carry0 = (base, jnp.int32(-1), jnp.zeros((), bool), key)
        (st, done_t, hit, _), _ = jax.lax.scan(body, carry0, acts)
        return done_t, hit

    done_t_ours, hit_ours = jax.jit(jax.vmap(run_ours))(
        jax.random.split(jax.random.PRNGKey(2), M))
    done_t_ours = np.asarray(done_t_ours)
    hit_ours = np.asarray(hit_ours)

    done_t_ref = np.full(M, -1)
    hit_ref = np.zeros(M, bool)
    for i in range(M):
        r = copy.deepcopy(ref)
        r._np_random = np.random.default_rng(50_000 + i)
        for t, a in enumerate(actions):
            _, rew, term, trunc, _ = r.step(int(a))
            if term or trunc:
                done_t_ref[i] = t
                hit_ref[i] = rew < 0
                break

    def tcounts(d):
        return np.bincount(d + 1, minlength=T + 1)  # bin 0 = survived

    p_t = chi2_two_sample(tcounts(done_t_ours), tcounts(done_t_ref))
    assert p_t >= P_THRESHOLD, f"termination-time mismatch p={p_t}"
    p_h = chi2_two_sample(
        np.bincount(hit_ours.astype(int), minlength=2),
        np.bincount(hit_ref.astype(int), minlength=2))
    assert p_h >= P_THRESHOLD, f"collision-rate mismatch p={p_h}"


def test_generation_distribution_smoke():
    """Default-tier guardrail at small N (coarse errors only)."""
    compare("MiniGrid-DoorKey-5x5-v0", 1_500)


def test_fresh_autoreset_routing():
    """Structural guard for the fresh-buffer exact auto-reset
    (envs/base.py autoreset_step_fresh): every finishing env restarts from
    exactly its rank-assigned buffer row (an independent fresh draw), the
    cursor advances by the finisher count, and same-step finishers get
    DISTINCT layouts — the property the broadcast-row pooled path lacks."""
    import jax.numpy as jnp

    import minigrid_tpu
    from minigrid_tpu.envs.base import (autoreset_step_fresh,
                                        presample_fresh_reset_states)

    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0").packed()
    B = 64
    _, st = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    st = st.replace(step_count=jnp.where(
        jnp.arange(B) % 2 == 0, env.params.max_steps - 1, st.step_count))
    buf = presample_fresh_reset_states(env, jax.random.PRNGKey(9), 128)
    sk = jax.random.split(jax.random.PRNGKey(1), B)
    _, st2, _, term, trunc, info, cur = jax.jit(
        lambda k, s, a, b: autoreset_step_fresh(
            env, k, s, a, b, jnp.zeros((), jnp.int32)))(
        sk, st, jnp.zeros((B,), jnp.int32), buf)
    done = np.asarray(term | trunc)
    assert done.sum() == B // 2
    assert int(cur) == done.sum()
    assert int(info["reset_overflow"]) == 0  # 32 finishers fit the window
    rank = np.cumsum(done) - done
    sigs = set()
    for b in range(B):
        if not done[b]:
            continue
        r = int(rank[b])
        assert (np.asarray(st2.grid[b]) == np.asarray(buf.grid[r])).all()
        assert (np.asarray(st2.agent_pos[b])
                == np.asarray(buf.agent_pos[r])).all()
        assert int(st2.step_count[b]) == 0
        sigs.add((np.asarray(st2.grid[b]).tobytes(),
                  tuple(np.asarray(st2.agent_pos[b])),
                  int(st2.agent_dir[b])))
    # independent 8x8 draws collide with negligible probability
    assert len(sigs) >= done.sum() - 2, (
        f"same-step finishers shared layouts: {len(sigs)}/{done.sum()}")


def test_fresh_autoreset_overflow_signal():
    """Degraded fresh resets are VISIBLE, never silent
    (envs/base.py autoreset_step_fresh info["reset_overflow"]):

    1. a synchronized truncation wave (a user who skips reset_staggered)
       larger than the routing window reports every clamped rank;
    2. a cursor past ``n_buf - window`` (buffer exhausted, e.g. a trained
       policy finishing far faster than the sizing assumed) reports the
       re-read rows."""
    import jax.numpy as jnp

    import minigrid_tpu
    from minigrid_tpu.envs.base import (autoreset_step_fresh,
                                        presample_fresh_reset_states)

    env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0").packed()
    B, W = 64, 16
    _, st = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    # synchronized wave: every env truncates on this step
    st = st.replace(step_count=jnp.full((B,), env.params.max_steps - 1))
    buf = presample_fresh_reset_states(env, jax.random.PRNGKey(9), 128)
    sk = jax.random.split(jax.random.PRNGKey(1), B)
    acts = jnp.zeros((B,), jnp.int32)
    step = jax.jit(lambda k, s, a, b, c: autoreset_step_fresh(
        env, k, s, a, b, c, window=W))

    _, st2, _, te, tr, info, cur = step(sk, st, acts, buf,
                                        jnp.zeros((), jnp.int32))
    assert bool((te | tr).all())
    # ranks W..B-1 clamp onto the last window row
    assert int(info["reset_overflow"]) == B - W
    assert int(cur) == B

    # buffer exhaustion: cursor already at the end — the start clamp
    # re-reads previously consumed rows and reports every one of them
    _, _, _, _, _, info2, _ = step(sk, st, acts, buf,
                                   jnp.asarray(128, jnp.int32))
    assert int(info2["reset_overflow"]) == B

    # train metrics surface the rollout-summed count (models/ppo.py)
    from minigrid_tpu.core.obs import gen_obs
    from minigrid_tpu.models.actor_critic import ActorCritic, init_params
    from minigrid_tpu.models.ppo import (PPOConfig, make_optimizer,
                                         make_train_step)

    cfg = PPOConfig(num_envs=16, rollout_len=8, num_epochs=1,
                    num_minibatches=2)
    model = ActorCritic(hidden=32)
    opt = make_optimizer(cfg)
    params = init_params(jax.random.PRNGKey(0), model=model, packed=True)
    train = jax.jit(make_train_step(env, model, cfg, opt, resets="fresh"))
    _, stb = jax.vmap(env.reset)(
        jax.random.split(jax.random.PRNGKey(3), cfg.num_envs))
    obsb = jax.vmap(lambda s: gen_obs(env.params, s))(stb)
    out = train(params, opt.init(params), stb, obsb,
                jax.random.PRNGKey(4), None)
    assert "reset_overflow" in out[5]
    assert int(out[5]["reset_overflow"]) >= 0


@pytest.mark.nightly
def test_fresh_autoreset_reset_distribution():
    """Layouts entered through the fresh-buffer exact auto-reset path match
    the reference's reset() distribution — sampling EVERY finisher, not one
    per step: unlike the pooled broadcast-row path, every reset is an
    independent fresh draw, so no same-step-sharing caveat applies."""
    import jax.numpy as jnp

    import minigrid_tpu
    from minigrid_tpu.envs.base import (autoreset_step_fresh,
                                        presample_fresh_reset_states)

    env_id = "MiniGrid-DoorKey-5x5-v0"
    env = minigrid_tpu.make(env_id).replace_params(max_steps=8)
    B, T, CHUNKS = 128, 40, 4
    obs, st = jax.jit(jax.vmap(env.reset_staggered))(
        jax.random.split(jax.random.PRNGKey(1), B))
    n_buf = int(T * B / env.params.max_steps * 1.3) + 64

    def chunk(st, ck):
        buf = presample_fresh_reset_states(
            env, jax.random.fold_in(ck, 7), n_buf)

        def body(carry, k):
            st, cur = carry
            keys = jax.random.split(k, B)
            acts = jax.random.randint(jax.random.fold_in(k, 1), (B,), 0, 7)
            _, st2, r, te, tr, _, cur = autoreset_step_fresh(
                env, keys, st, acts, buf, cur)
            done = te | tr
            sample = (st2.grid[..., 0], st2.grid[..., 1],
                      st2.agent_pos, st2.agent_dir, done)
            return (st2, cur), sample

        (st, _), samples = jax.lax.scan(
            body, (st, jnp.zeros((), jnp.int32)), jax.random.split(ck, T))
        return st, samples

    chunk = jax.jit(chunk)
    types, colors, pos, dirs = [], [], [], []
    for c in range(CHUNKS):
        st, (ts, cs, ps, ds, done) = chunk(
            st, jax.random.fold_in(jax.random.PRNGKey(2), c))
        done = np.asarray(done).reshape(-1)
        types.append(np.asarray(ts).reshape(-1, *ts.shape[2:])[done])
        colors.append(np.asarray(cs).reshape(-1, *cs.shape[2:])[done])
        pos.append(np.asarray(ps).reshape(-1, 2)[done])
        dirs.append(np.asarray(ds).reshape(-1)[done])
    ours = occupancy_counts(np.concatenate(types), np.concatenate(colors),
                            np.concatenate(pos), np.concatenate(dirs))
    n = sum(t.shape[0] for t in types)
    assert n >= 2000, f"too few reset samples collected: {n}"
    ref = occupancy_counts(*ref_sample(env_id, n))
    failures = []
    for k in sorted(set(ours) & set(ref)):
        p = chi2_two_sample(ours[k], ref[k])
        if p < P_THRESHOLD:
            failures.append((k, p))
    assert not failures, f"fresh reset distribution mismatch: {failures}"


"""Wrapper parity vs the reference wrapper implementations (lockstep)."""

import numpy as np
import pytest

from tests.ref_oracle import make_reference, state_from_reference

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu import wrappers as W

from tests.conftest import add_reference_to_path

add_reference_to_path()
import minigrid.wrappers as RW  # noqa: E402

ACTIONS = [2, 1, 2, 2, 0, 2, 3, 2, 5, 2, 4, 2, 1, 2, 2]


def lockstep(env_id, ref_wrap, tpu_wrap, n_steps=12, seed=3, compare=None,
             actions=None):
    """Run both wrapped envs from the same imported layout; compare obs."""
    ref_base = make_reference(env_id)
    ref = ref_wrap(ref_base)
    ref_obs, _ = ref.reset(seed=seed)

    env = minigrid_tpu.make(env_id)
    wrapped = tpu_wrap(env)
    state = state_from_reference(ref_base, env, jax.random.PRNGKey(0))
    # re-wrap initial state if the wrapper is stateful
    if hasattr(wrapped, "reset") and type(wrapped).reset is not W.Wrapper.reset \
            and not isinstance(wrapped, W.ObservationWrapper):
        _, wstate = wrapped.reset(jax.random.PRNGKey(0))
        if isinstance(wstate, W.WrappedState):
            state = wstate.replace(inner=state)
    obs = None
    if isinstance(wrapped, W.ObservationWrapper):
        obs = wrapped.observation(
            __import__("minigrid_tpu").core.obs.gen_obs(env.params, state), state)
        compare(obs, ref_obs, -1)

    step = jax.jit(wrapped.step)
    key = jax.random.PRNGKey(7)
    for t, a in enumerate((actions or ACTIONS)[:n_steps]):
        ref_obs, ref_rew, ref_term, ref_trunc, _ = ref.step(a)
        key, sub = jax.random.split(key)
        obs, state, rew, te, tr, _ = step(sub, state, a)
        compare(obs, ref_obs, t)
        np.testing.assert_allclose(float(rew), float(ref_rew), rtol=1e-5,
                                   atol=1e-6, err_msg=f"t={t}")
        assert bool(te) == bool(ref_term) and bool(tr) == bool(ref_trunc)
        if ref_term or ref_trunc:
            break


def cmp_image(obs, ref_obs, t):
    np.testing.assert_array_equal(np.asarray(obs["image"]), ref_obs["image"],
                                  err_msg=f"t={t}")


def test_img_obs():
    lockstep("MiniGrid-DoorKey-8x8-v0", RW.ImgObsWrapper, W.ImgObsWrapper,
             compare=lambda o, r, t: np.testing.assert_array_equal(
                 np.asarray(o), r, err_msg=f"t={t}"))


def test_one_hot():
    lockstep("MiniGrid-DoorKey-8x8-v0", RW.OneHotPartialObsWrapper,
             W.OneHotPartialObsWrapper, compare=cmp_image)


def test_fully_obs():
    lockstep("MiniGrid-DoorKey-8x8-v0", RW.FullyObsWrapper, W.FullyObsWrapper,
             compare=cmp_image)


def test_rgb_full():
    lockstep("MiniGrid-LavaGapS7-v0", RW.RGBImgObsWrapper, W.RGBImgObsWrapper,
             n_steps=4, compare=cmp_image)


def test_rgb_partial():
    lockstep("MiniGrid-LavaGapS7-v0", RW.RGBImgPartialObsWrapper,
             W.RGBImgPartialObsWrapper, n_steps=4, compare=cmp_image)


def test_view_size():
    for v in [3, 5, 9]:
        lockstep("MiniGrid-DoorKey-8x8-v0",
                 lambda e, v=v: RW.ViewSizeWrapper(e, agent_view_size=v),
                 lambda e, v=v: W.ViewSizeWrapper(e, agent_view_size=v),
                 n_steps=6, compare=cmp_image)


def test_dict_observation_space():
    def cmp(obs, ref_obs, t):
        ids = list(np.asarray(obs["mission"]))
        assert ids == ref_obs["mission"], f"t={t}"

    lockstep("MiniGrid-LavaCrossingS9N1-v0", RW.DictObservationSpaceWrapper,
             W.DictObservationSpaceWrapper, n_steps=3, compare=cmp)


def test_flat_obs():
    def cmp(obs, ref_obs, t):
        np.testing.assert_array_equal(np.asarray(obs), ref_obs, f"t={t}")

    lockstep("MiniGrid-LavaCrossingS9N1-v0", RW.FlatObsWrapper,
             W.FlatObsWrapper, n_steps=3, compare=cmp)


def test_symbolic():
    def cmp(obs, ref_obs, t):
        np.testing.assert_array_equal(np.asarray(obs["image"]),
                                      ref_obs["image"], f"t={t}")

    lockstep("MiniGrid-DoorKey-8x8-v0", RW.SymbolicObsWrapper,
             W.SymbolicObsWrapper, compare=cmp)


def test_direction_obs():
    def cmp(obs, ref_obs, t):
        np.testing.assert_allclose(
            float(obs["goal_direction"]), float(ref_obs["goal_direction"]),
            rtol=1e-6, err_msg=f"t={t}")

    lockstep("MiniGrid-Empty-8x8-v0", RW.DirectionObsWrapper,
             W.DirectionObsWrapper, n_steps=6, compare=cmp)


@pytest.mark.parametrize("ref_cls,tpu_cls", [
    (RW.ActionBonus, W.ActionBonus),
    (RW.PositionBonus, W.PositionBonus),
])
def test_bonus_rewards(ref_cls, tpu_cls):
    lockstep("MiniGrid-Empty-5x5-v0", ref_cls, tpu_cls, n_steps=15,
             compare=cmp_image)


def test_no_death():
    # walk straight into the first lava river; NoDeath converts the death
    lockstep(
        "MiniGrid-DistShift1-v0",
        lambda e: RW.NoDeath(e, no_death_types=("lava",), death_cost=-1.0),
        lambda e: W.NoDeath(e, no_death_types=("lava",), death_cost=-1.0),
        n_steps=8, compare=cmp_image,
        actions=[2, 2, 2, 2, 2, 2, 1, 2],
    )


def test_reseed_cycles():
    env = minigrid_tpu.make("MiniGrid-Empty-Random-5x5-v0")
    w = W.ReseedWrapper(env, seeds=[0, 1], seed_idx=0)
    obs0, st0 = w.reset(jax.random.PRNGKey(9))
    obs1, st1 = w.reset(w.seed_keys[st0.wrapper - 1])  # same underlying API
    # cycling: two resets from idx 0 and idx 1 give different layouts,
    # third wraps back to the first
    obs_a, st = w.reset(jax.random.PRNGKey(0))
    obs_b, st = w.reset(jax.random.PRNGKey(0), _idx=st.wrapper)
    obs_c, st = w.reset(jax.random.PRNGKey(0), _idx=st.wrapper)
    assert np.array_equal(np.asarray(obs_a["image"]), np.asarray(obs_c["image"]))


def test_stochastic_action_smoke():
    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    w = W.StochasticActionWrapper(env, prob=0.5)
    obs, state = w.reset(jax.random.PRNGKey(0))
    step = jax.jit(w.step)
    dirs = set()
    for i in range(20):
        obs, state, *_ = step(jax.random.PRNGKey(i), state, 6)  # 'done' no-op
        dirs.add(int(state.agent_dir))
    assert len(dirs) > 1, "replacement actions never fired"


def test_stateless_wrappers_ride_fast_paths():
    """Stacks of stateless ObservationWrappers get the pooled/presampled/
    fresh fast paths: the base env steps batched, then the observation
    chain applies — output must equal wrapping the bare pooled output."""
    import minigrid_tpu
    from minigrid_tpu import wrappers as W
    from minigrid_tpu.envs.base import presample_reset_states

    base = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    env = W.FullyObsWrapper(W.DictObservationSpaceWrapper(base))
    B = 16
    pool = env.make_pool(jax.random.PRNGKey(0), 32)
    _, st = jax.jit(jax.vmap(base.reset_staggered))(
        jax.random.split(jax.random.PRNGKey(1), B))
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    acts = jnp.zeros((B,), jnp.int32)

    obs_w, st2, r, te, tr, _ = jax.jit(
        lambda k, s, a: env.step_autoreset_pooled(k, s, a, pool))(
        keys, st, acts)
    obs_b, st2b, rb, teb, trb, _ = jax.jit(
        lambda k, s, a: base.step_autoreset_pooled(k, s, a, pool))(
        keys, st, acts)
    # same dynamics, wrapped observations == chain applied to bare output
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), st2, st2b))
    chained = env._apply_obs_chain(obs_b, st2b)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), obs_w, chained))
    assert obs_w["image"].shape == (B, 5, 5, 3)  # FullyObs grid
    assert obs_w["mission"].shape == (B, 50)     # Dict mission padding

    # fresh exact path through the wrapper
    buf = env.presample_fresh(jax.random.PRNGKey(3), 64)
    obs_f, st3, r3, te3, tr3, _, cur = jax.jit(
        lambda k, s, a: env.step_autoreset_fresh(
            k, s, a, buf, jnp.zeros((), jnp.int32)))(keys, st, acts)
    assert obs_f["image"].shape == (B, 5, 5, 3)

    # packed() rebuilds the stack over a packed inner env
    imgp = W.ImgObsWrapper(base).packed()
    _, stp = jax.jit(jax.vmap(imgp.env.reset))(
        jax.random.split(jax.random.PRNGKey(4), B))
    obs_p, *_ = jax.jit(
        lambda k, s, a: imgp.step_autoreset_pooled(
            k, s, a, imgp.make_pool(jax.random.PRNGKey(5), 16)))(
        keys, stp, acts)
    assert obs_p.shape == (B, 7, 7)  # array-only packed (view-size) obs


def test_stateful_wrappers_still_blocked():
    """Wrappers whose state the fast paths cannot honor must fail loudly
    instead of silently delegating past their transforms. ReseedWrapper
    is the remaining case BY DESIGN: it dictates reset layouts, which
    contradicts pool/buffer-routed resets (the bonuses and DirectionObs
    now ride the fast paths via the _StatefulFastPath pattern)."""
    import pytest as _pytest

    import minigrid_tpu
    from minigrid_tpu import wrappers as W
    from minigrid_tpu.models.actor_critic import ActorCritic
    from minigrid_tpu.models.ppo import (PPOConfig, make_optimizer,
                                         make_train_step)
    from minigrid_tpu.parallel.rollout import make_rollout

    env = W.ReseedWrapper(minigrid_tpu.make("MiniGrid-Empty-5x5-v0"),
                          seeds=(1, 2))
    with _pytest.raises(NotImplementedError):
        env.step_autoreset_pooled(None, None, None, None)
    with _pytest.raises(NotImplementedError):
        env.make_pool(None, 4)
    cfg = PPOConfig(num_envs=8, rollout_len=8, num_minibatches=2)
    with _pytest.raises(NotImplementedError):
        make_train_step(env, ActorCritic(hidden=16), cfg,
                        make_optimizer(cfg), pooled=True)
    with _pytest.raises(NotImplementedError):
        make_rollout(env, None, length=8, pooled=True)
    # a stateful wrapper anywhere in the stack blocks the whole stack
    stacked = W.ImgObsWrapper(W.ActionBonus(
        minigrid_tpu.make("MiniGrid-Empty-5x5-v0")))
    with _pytest.raises(NotImplementedError):
        stacked.step_autoreset_pooled(None, None, None, None)
    assert stacked.unwrapped() is stacked.env.env
    # stateful-over-stateful: the outer override must not silently
    # delegate past the inner wrapper's state handling
    for nested in (
        W.DirectionObsWrapper(W.ActionBonus(
            minigrid_tpu.make("MiniGrid-Empty-5x5-v0"))),
        W.ActionBonus(W.PositionBonus(
            minigrid_tpu.make("MiniGrid-Empty-5x5-v0"))),
        W.PositionBonus(W.ImgObsWrapper(W.ActionBonus(
            minigrid_tpu.make("MiniGrid-Empty-5x5-v0")))),
    ):
        with _pytest.raises(NotImplementedError):
            nested._fast_plan()


def test_transition_wrappers_ride_fast_paths():
    """NoDeath / StochasticActionWrapper (memoryless TransitionWrappers)
    compose into the batched pooled/presampled/fresh fast paths: the
    composed vmapped step_state must produce exactly the per-env wrapper
    step outcome (for envs that don't reset this step)."""
    import minigrid_tpu
    from minigrid_tpu import wrappers as W

    base = minigrid_tpu.make("MiniGrid-DistShift1-v0")
    env = W.NoDeath(base, no_death_types=("lava",), death_cost=-1.0)
    B = 8
    keys_r = jax.random.split(jax.random.PRNGKey(0), B)
    _, st = jax.jit(jax.vmap(base.reset))(keys_r)
    # DistShift1: forward marches row 1 toward the lava strip; after a few
    # forwards some envs stand in front of lava — forward then dies
    step_keys = jax.random.split(jax.random.PRNGKey(1), B)
    fwd = jnp.full((B,), 2, jnp.int32)
    for _ in range(3):
        _, st, *_ = jax.jit(jax.vmap(base.step))(step_keys, st, fwd)
    st = st.replace(terminated=jnp.zeros_like(st.terminated))

    pool = env.make_pool(jax.random.PRNGKey(2), 16)
    obs_f, st_f, r_f, te_f, tr_f, _ = jax.jit(
        lambda k, s, a: env.step_autoreset_pooled(k, s, a, pool))(
        step_keys, st, fwd)
    # nothing terminates (NoDeath cancels the lava death) and nothing
    # truncates this early, so no env reset: fast-path outcome must equal
    # the per-env wrapper step exactly
    assert not bool((te_f | tr_f).any())
    some_penalty = False
    for b in range(B):
        o_b, st_b, r_b, te_b, tr_b, _ = jax.jit(env.step)(
            step_keys[b], jax.tree.map(lambda x: x[b], st), int(fwd[b]))
        assert float(r_b) == float(r_f[b])
        assert bool(te_b) == bool(te_f[b])
        np.testing.assert_array_equal(np.asarray(st_b.grid),
                                      np.asarray(st_f.grid[b]))
        np.testing.assert_array_equal(np.asarray(st_b.agent_pos),
                                      np.asarray(st_f.agent_pos[b]))
        some_penalty = some_penalty or float(r_b) < 0
    assert some_penalty, "no env hit lava — the scenario lost its teeth"

    # deterministic replacement: prob=0 + random_action makes the
    # stochastic wrapper a constant action map, checkable exactly
    senv = W.StochasticActionWrapper(base, prob=0.0, random_action=0)
    _, st0 = jax.jit(jax.vmap(base.reset))(keys_r)
    obs_s, st_s, *_ = jax.jit(
        lambda k, s, a: senv.step_autoreset_pooled(k, s, a, pool))(
        step_keys, st0, fwd)
    # forward was replaced by left everywhere: direction turned, pos fixed
    np.testing.assert_array_equal(np.asarray(st_s.agent_pos),
                                  np.asarray(st0.agent_pos))
    np.testing.assert_array_equal(np.asarray(st_s.agent_dir),
                                  np.asarray((st0.agent_dir - 1) % 4))

    # stacking: NoDeath(Stochastic) still composes + fresh path runs
    stack = W.NoDeath(W.StochasticActionWrapper(base, prob=1.0),
                      no_death_types=("lava",))
    buf = stack.presample_fresh(jax.random.PRNGKey(5), 32)
    _, st1, r1, te1, tr1, info, cur = jax.jit(
        lambda k, s, a: stack.step_autoreset_fresh(
            k, s, a, buf, jnp.zeros((), jnp.int32)))(step_keys, st, fwd)
    assert "reset_overflow" in info
    assert not bool(te1.any())  # prob=1.0 forwards + NoDeath cancels


def test_stacked_transition_wrappers_key_streams():
    """Two stacked rng-using TransitionWrappers must draw DISTINCT
    per-layer transform keys, and the nested ``step`` path must agree
    exactly with the composed batched fast path (round-5 review finding:
    un-indexed salts made stacked StochasticActionWrappers repeat the
    same draw on the exact path, diverging from the fast path)."""
    import minigrid_tpu
    from minigrid_tpu import wrappers as W

    base = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
    stack = W.StochasticActionWrapper(
        W.StochasticActionWrapper(base, prob=0.5), prob=0.5)
    assert stack._t_depth == 1 and stack.env._t_depth == 0

    B = 32
    keys_r = jax.random.split(jax.random.PRNGKey(0), B)
    _, st = jax.jit(jax.vmap(base.reset))(keys_r)
    step_keys = jax.random.split(jax.random.PRNGKey(1), B)
    fwd = jnp.full((B,), 2, jnp.int32)

    pool = stack.make_pool(jax.random.PRNGKey(2), 16)
    _, st_f, r_f, te_f, tr_f, _ = jax.jit(
        lambda k, s, a: stack.step_autoreset_pooled(k, s, a, pool))(
        step_keys, st, fwd)
    assert not bool((te_f | tr_f).any())  # fresh episodes: nobody resets
    for b in range(B):
        _, st_b, r_b, *_ = jax.jit(stack.step)(
            step_keys[b], jax.tree.map(lambda x: x[b], st), int(fwd[b]))
        np.testing.assert_array_equal(np.asarray(st_b.agent_pos),
                                      np.asarray(st_f.agent_pos[b]))
        np.testing.assert_array_equal(np.asarray(st_b.agent_dir),
                                      np.asarray(st_f.agent_dir[b]))
        assert float(r_b) == float(r_f[b])


def test_action_bonus_fast_path():
    """The stateful-wrapper batched pattern (ActionBonus outermost):
    pooled/presampled/fresh fast paths thread the WrappedState batch, the
    dense count update matches the per-env scatter exactly, and counts
    persist across resets."""
    import minigrid_tpu
    from minigrid_tpu import wrappers as W
    from minigrid_tpu.envs.base import presample_reset_states

    base = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    w = W.ActionBonus(base)
    B = 8
    obs, wst = jax.jit(jax.vmap(w.reset))(
        jax.random.split(jax.random.PRNGKey(0), B))
    assert isinstance(wst, W.WrappedState)
    pool = w.make_pool(jax.random.PRNGKey(1), 16)

    actions = [jnp.full((B,), a, jnp.int32) for a in (2, 1, 2)]
    keys = [jax.random.split(jax.random.PRNGKey(10 + t), B)
            for t in range(3)]
    fast = jax.jit(lambda k, s, a, r: w.step_autoreset_presampled(k, s, a, r))
    slow = jax.jit(jax.vmap(w.step))

    wst_f, wst_s = wst, wst
    for t in range(3):
        st_r = jax.tree.map(
            lambda x: x[0],
            presample_reset_states(jax.random.PRNGKey(20 + t), pool, 1))
        _, wst_f, r_f, te_f, tr_f, _ = fast(keys[t], wst_f, actions[t], st_r)
        _, wst_s, r_s, te_s, tr_s, _ = slow(keys[t], wst_s, actions[t])
        # fresh episodes, no resets in 3 steps: outcomes must match exactly
        assert not bool((te_f | tr_f).any())
        np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_s),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(wst_f.wrapper),
                                      np.asarray(wst_s.wrapper))
        np.testing.assert_array_equal(np.asarray(wst_f.inner.agent_pos),
                                      np.asarray(wst_s.inner.agent_pos))
    # visits recorded: 3 per env
    assert int(wst_f.wrapper.sum()) == 3 * B

    # counts persist across a forced reset (the reference dict semantics)
    wst_wave = wst_f.replace(inner=wst_f.inner.replace(
        step_count=jnp.full((B,), base.params.max_steps - 1)))
    st_r = jax.tree.map(
        lambda x: x[0], presample_reset_states(jax.random.PRNGKey(9),
                                               pool, 1))
    _, wst2, _, te2, tr2, _ = fast(keys[0], wst_wave, actions[0], st_r)
    assert bool((te2 | tr2).all())
    assert int(wst2.inner.step_count.max()) == 0
    assert int(wst2.wrapper.sum()) == 4 * B  # counts kept + this step

    # fresh path variant
    buf = w.presample_fresh(jax.random.PRNGKey(3), 32)
    _, wst3, _, _, _, info, cur = jax.jit(
        lambda k, s, a: w.step_autoreset_fresh(
            k, s, a, buf, jnp.zeros((), jnp.int32)))(
        keys[1], wst2, actions[1])
    assert isinstance(wst3, W.WrappedState)
    assert "reset_overflow" in info


def test_position_bonus_fast_path():
    """PositionBonus rides the batched fast paths via the shared
    _CountBonus machinery: the dense (B, W, H) count update matches the
    per-env scatter exactly and counts persist across resets."""
    import minigrid_tpu
    from minigrid_tpu import wrappers as W
    from minigrid_tpu.envs.base import presample_reset_states

    base = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    w = W.PositionBonus(base)
    B = 8
    obs, wst = jax.jit(jax.vmap(w.reset))(
        jax.random.split(jax.random.PRNGKey(0), B))
    assert isinstance(wst, W.WrappedState)
    pool = w.make_pool(jax.random.PRNGKey(1), 16)

    actions = [jnp.full((B,), a, jnp.int32) for a in (2, 0, 2)]
    keys = [jax.random.split(jax.random.PRNGKey(30 + t), B)
            for t in range(3)]
    fast = jax.jit(lambda k, s, a, r: w.step_autoreset_presampled(k, s, a, r))
    slow = jax.jit(jax.vmap(w.step))

    wst_f, wst_s = wst, wst
    for t in range(3):
        st_r = jax.tree.map(
            lambda x: x[0],
            presample_reset_states(jax.random.PRNGKey(40 + t), pool, 1))
        _, wst_f, r_f, te_f, tr_f, _ = fast(keys[t], wst_f, actions[t], st_r)
        _, wst_s, r_s, te_s, tr_s, _ = slow(keys[t], wst_s, actions[t])
        assert not bool((te_f | tr_f).any())
        np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_s),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(wst_f.wrapper),
                                      np.asarray(wst_s.wrapper))
    assert int(wst_f.wrapper.sum()) == 3 * B

    # counts persist across a forced truncation wave
    wst_wave = wst_f.replace(inner=wst_f.inner.replace(
        step_count=jnp.full((B,), base.params.max_steps - 1)))
    st_r = jax.tree.map(
        lambda x: x[0], presample_reset_states(jax.random.PRNGKey(9),
                                               pool, 1))
    _, wst2, _, te2, tr2, _ = fast(keys[0], wst_wave, actions[0], st_r)
    assert bool((te2 | tr2).all())
    assert int(wst2.wrapper.sum()) == 4 * B


def test_direction_obs_fast_path():
    """DirectionObs rides the batched fast paths: the augmented
    goal_direction matches the per-env step exactly, and the goal cache
    re-derives from whatever layout the reset select routed in."""
    import minigrid_tpu
    from minigrid_tpu import wrappers as W
    from minigrid_tpu.envs.base import presample_reset_states

    base = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    w = W.DirectionObsWrapper(base, type="slope")
    B = 8
    obs, wst = jax.jit(jax.vmap(w.reset))(
        jax.random.split(jax.random.PRNGKey(0), B))
    assert "goal_direction" in obs
    pool = w.make_pool(jax.random.PRNGKey(1), 16)
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    fwd = jnp.full((B,), 2, jnp.int32)
    st_r = jax.tree.map(
        lambda x: x[0], presample_reset_states(jax.random.PRNGKey(3),
                                               pool, 1))
    fast = jax.jit(lambda k, s, a, r: w.step_autoreset_presampled(k, s, a, r))
    obs_f, wst_f, r_f, te, tr, _ = fast(keys, wst, fwd, st_r)
    obs_s, wst_s, r_s, *_ = jax.jit(jax.vmap(w.step))(keys, wst, fwd)
    assert not bool((te | tr).any())
    np.testing.assert_allclose(np.asarray(obs_f["goal_direction"]),
                               np.asarray(obs_s["goal_direction"]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(wst_f.wrapper),
                                  np.asarray(wst_s.wrapper))

    # forced wave: the goal cache must re-derive from the routed layout
    wave = wst_f.replace(inner=wst_f.inner.replace(
        step_count=jnp.full((B,), base.params.max_steps - 1)))
    obs2, wst2, _, te2, tr2, _ = fast(keys, wave, fwd, st_r)
    assert bool((te2 | tr2).all())
    goal_expected = jax.vmap(w._goal_position)(wst2.inner)
    np.testing.assert_array_equal(np.asarray(wst2.wrapper),
                                  np.asarray(goal_expected))

    # fresh path variant
    buf = w.presample_fresh(jax.random.PRNGKey(4), 32)
    obs3, wst3, _, _, _, info, cur = jax.jit(
        lambda k, s, a: w.step_autoreset_fresh(
            k, s, a, buf, jnp.zeros((), jnp.int32)))(keys, wst2, fwd)
    assert "reset_overflow" in info and "goal_direction" in obs3

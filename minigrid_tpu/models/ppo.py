"""PPO learner over batched device-resident environments.

End-to-end on-device training: the rollout is a ``lax.scan`` whose body steps
B vmapped envs *and* evaluates the policy — no host round-trips — followed by
GAE and a clipped surrogate update. The whole train step is one jittable
function, so under a mesh (parallel/mesh.py) the batch axis shards over
``data`` and the network over ``model`` with XLA inserting the gradient
psums (the reference has no training stack at all; this replaces the
external rl-starter-files pointed to by its README).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from minigrid_tpu.models.actor_critic import ActorCritic, encode_obs


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 4096
    rollout_len: int = 128
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 2.5e-4
    max_grad_norm: float = 0.5
    # One pass over the rollout per update: at the default scale every
    # update sees 524k FRESH samples (4096 envs x 128 steps), where a
    # second epoch buys little policy improvement but doubles the update
    # phase — the measured FLOP floor of a 2-epoch update alone exceeds
    # the whole 20M steps/s train-step budget. Validated end-to-end: the
    # one-epoch flagship config trains DoorKey-8x8 to >=95% episode
    # success (RESULTS.md). Set 2+ for small-batch / sample-efficient
    # regimes.
    num_epochs: int = 1
    num_minibatches: int = 4
    # minibatch shuffling:
    #  - "rotate" (default): zero-copy — minibatches are the FIXED
    #    contiguous timestep slabs [i*mbt, (i+1)*mbt), visited in a
    #    rotated random order each epoch. Slab composition does not vary,
    #    but every train step fills the buffer with fresh data, so the
    #    partition is unbiased; each sample is used exactly once per
    #    epoch. Chosen because any data movement at this scale is real
    #    money: the full timestep permutation gathers the stored feature
    #    buffer at ~9.6 ms/epoch, and jnp.roll lowers to a 2x-padded
    #    copy. Learning guards + the DoorKey/BabyAI success-rate runs
    #    validate the reduced mixing.
    #  - "timestep": full random permutation of rollout steps, then
    #    contiguous slab cuts (exact timestep-level shuffling).
    #  - "sample": exact per-sample permutation (a per-row gather, ~3x
    #    slower update phase at scale).
    # rollout_len must divide by num_minibatches in rotate/timestep modes.
    shuffle: str = "rotate"


class Transition(NamedTuple):
    obs: Any
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array
    # recurrent policies only: the hidden state FED INTO this step's
    # forward (minibatch slabs replay the GRU from their first step's
    # stored hidden — truncated BPTT over contiguous slabs)
    hidden: Any = None


def _selected_log_prob(log_probs, action):
    """log_probs[..., action] via a one-hot multiply-sum. ``take_along_axis``
    lowers to a per-row gather that serializes on TPU (~5 ns/row — profiled
    at 1.0 ms per 131k-sample minibatch and 4.0 ms per rollout for this one
    op); the one-hot compare+reduce over the 7 actions is a fused VPU pass."""
    oh = action[..., None] == jnp.arange(log_probs.shape[-1])
    return jnp.where(oh, log_probs, 0.0).sum(-1)


def make_train_loop(env, model: "ActorCritic", cfg: "PPOConfig", optimizer,
                    steps_per_call: int = 8, **kw):
    """Scan ``steps_per_call`` train steps inside ONE compiled call.

    Each dispatch through a remote runtime costs ~3 ms of host latency —
    at the flagship scale that is >10% of a train step. The scanned loop
    amortizes it (measured: 19.8M -> 23.3M env-steps/s at K=8 with fresh
    resets). Any ``make_train_step`` kwargs pass through; with pooled
    resets the same pool serves all K steps, so pick K <= your pool
    refresh cadence. Returns ``train_loop(params, opt_state, env_state,
    obs, key[, pool]) -> (..., metrics)`` with metrics stacked (K,)."""
    step = make_train_step(env, model, cfg, optimizer, **kw)
    if getattr(model, "is_recurrent", False):
        def train_loop(params, opt_state, env_state, obs, h, key,
                       pool=None):
            def body(carry, _):
                params, opt_state, env_state, obs, h, key = carry
                params, opt_state, env_state, obs, h, key, m = step(
                    params, opt_state, env_state, obs, h, key, pool)
                return (params, opt_state, env_state, obs, h, key), m

            (params, opt_state, env_state, obs, h, key), metrics = \
                jax.lax.scan(body,
                             (params, opt_state, env_state, obs, h, key),
                             None, length=steps_per_call)
            return params, opt_state, env_state, obs, h, key, metrics

        return train_loop

    def train_loop(params, opt_state, env_state, obs, key, pool=None):
        def body(carry, _):
            params, opt_state, env_state, obs, key = carry
            params, opt_state, env_state, obs, key, m = step(
                params, opt_state, env_state, obs, key, pool)
            return (params, opt_state, env_state, obs, key), m

        (params, opt_state, env_state, obs, key), metrics = jax.lax.scan(
            body, (params, opt_state, env_state, obs, key), None,
            length=steps_per_call)
        return params, opt_state, env_state, obs, key, metrics

    return train_loop


def make_optimizer(cfg: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr),
    )


def make_train_step(env, model: ActorCritic, cfg: PPOConfig, optimizer,
                    pooled: bool = False, resets: str | None = None,
                    fresh_buffer: int | None = None):
    """Returns train_step(params, opt_state, env_state, obs, key) -> ...

    Reset modes (``resets``; ``pooled=True`` is shorthand for "pooled"):

    - ``"regen"`` (default): fresh ``_gen_grid`` per env per step,
      selected into finished envs — the semantic reference path.
    - ``"pooled"``: broadcast-row draws from a device-resident
      :class:`~minigrid_tpu.envs.base.LayoutPool` passed as the trailing
      ``train_step`` argument; refresh it between train steps
      (``refresh_layout_pool``). Fastest; same-step finishers share a
      layout.
    - ``"fresh"``: the exact-distribution fast path — every rollout
      pre-generates a buffer of independent layouts inside the compiled
      step and consumes each at most once
      (:func:`~minigrid_tpu.envs.base.autoreset_step_fresh`). Exact reset
      marginals AND same-step independence at near-pooled speed; no pool
      argument or refreshing needed. ``fresh_buffer`` overrides the
      buffer size (required for dynamic-budget envs like BabyAI levels,
      whose ``params.max_steps`` is a sentinel).

    Recurrent policies (``model.is_recurrent``, e.g.
    :class:`~minigrid_tpu.models.actor_critic.ActorCriticRNN`) change the
    signature to ``train_step(params, opt_state, env_state, obs, h, key[,
    pool]) -> (params, opt_state, env_state, obs, h, key, metrics)``: the
    hidden state threads across train steps, resets to zero per finished
    env, and each minibatch slab replays the cell from its first step's
    stored hidden (truncated BPTT — requires the contiguous "rotate"
    minibatch partition).
    """
    if resets is None:
        resets = "pooled" if pooled else "regen"
    assert resets in ("regen", "pooled", "fresh"), resets
    pooled = resets == "pooled"
    recurrent = bool(getattr(model, "is_recurrent", False))
    if recurrent:
        assert cfg.shuffle == "rotate", (
            "recurrent training needs contiguous timestep slabs: "
            f"shuffle='rotate' (got {cfg.shuffle})")

    if cfg.shuffle in ("rotate", "timestep"):
        assert cfg.rollout_len % cfg.num_minibatches == 0, (
            f"{cfg.shuffle} shuffling needs rollout_len ({cfg.rollout_len}) "
            f"divisible by num_minibatches ({cfg.num_minibatches})")
    else:
        assert cfg.shuffle == "sample", cfg.shuffle
        assert (cfg.num_envs * cfg.rollout_len) % cfg.num_minibatches == 0, (
            f"sample shuffling needs num_envs*rollout_len "
            f"({cfg.num_envs * cfg.rollout_len}) divisible by "
            f"num_minibatches ({cfg.num_minibatches}) — a remainder would "
            "silently drop/overlap tail samples")
    if resets in ("pooled", "fresh"):
        from minigrid_tpu.envs.base import presample_reset_states
        from minigrid_tpu.wrappers import Wrapper

        if isinstance(env, Wrapper):
            # stateless observation stacks, memoryless transition
            # wrappers (NoDeath, StochasticActionWrapper) and the
            # ActionBonus stateful pattern ride the batched fast paths
            # (the chain walk raises for unsupported stateful wrappers);
            # the model must accept the wrapped observation format
            env._fast_plan()
    else:
        step_env = jax.vmap(env.step_autoreset)
    fresh_window = 32
    if resets == "fresh":
        if fresh_buffer is None:
            ms = int(env.params.max_steps)
            if ms > 1 << 16:
                raise ValueError(
                    "resets='fresh' on a dynamic-budget env (max_steps "
                    f"sentinel {ms}): pass fresh_buffer explicitly")
            mean = cfg.num_envs * cfg.rollout_len / ms
            fresh_buffer = int(mean * 1.2) + 8 * int(mean ** 0.5) + 64
        # the per-step routing window must cover the same-step finisher
        # count (~Poisson(B/max_steps) with staggered resets) or overflow
        # ranks share the last row, quietly voiding the mode's
        # independence guarantee; size it ~2x the mean + 6 sigma
        mean_step = fresh_buffer / max(cfg.rollout_len, 1)
        fresh_window = max(32, int(2 * mean_step
                                   + 6 * mean_step ** 0.5) + 1)
        fresh_window = min(fresh_window, fresh_buffer)  # never outsize it

    def _counts(tokens):
        from minigrid_tpu.core.mission import VOCAB_SIZE

        return (tokens[..., None] == jnp.arange(VOCAB_SIZE)).sum(-2) \
            .astype(jnp.uint8)

    def rollout(params, env_state, obs, key, pool, h0=None):
        B, T = cfg.num_envs, cfg.rollout_len
        # observation formats (decided at trace time, static):
        #  - the native dict obs with mission tokens gets the full fast
        #    encoding: stored uint8 one-hot features + mission counts
        #    carried across steps (a mission only changes at reset, so the
        #    (B, L, V) token-count compare+reduce — profiled at 13 us/step
        #    — runs once up front and each step only selects the broadcast
        #    reset row's counts into finished envs)
        #  - wrapped/custom observations are stored as-is; the model must
        #    accept them directly
        std_obs = isinstance(obs, dict) and ("packed" in obs or "image" in obs)
        # counts are refreshed from the BARE reset state's tokens, so the
        # carry is only valid when no wrapper transforms the mission
        from minigrid_tpu.wrappers import Wrapper as _W

        carry_counts = (std_obs and "mission" in obs and pooled
                        and not isinstance(env, _W))

        def body(carry, xs_t):
            env_state, obs, counts, cursor, h, oflow = carry
            keys, gumbel = xs_t[0], xs_t[1]
            # parameter-free encoding computed ONCE: feeds the behaviour
            # forward AND the trajectory buffer, so the update phase never
            # rebuilds one-hot planes (models/actor_critic.py encode_obs)
            if carry_counts:
                enc = {"img_feat": encode_obs(
                           {k: v for k, v in obs.items() if k != "mission"}
                           | {"mission_counts": counts})["img_feat"],
                       "mission_counts": counts,
                       "direction": obs["direction"]}
            elif std_obs:
                enc = encode_obs(obs)
            else:
                enc = obs
            if recurrent:
                h_in = h
                (logits, value), h = model.apply(params, enc, h)
            else:
                logits, value = model.apply(params, enc)
            # categorical sampling with presampled Gumbel noise (all
            # per-step randomness — action noise and env step keys — is
            # drawn in two batched passes outside the scan and fed through
            # xs: in-loop threefry chains serialize ~1 ms per rollout)
            action = jnp.argmax(logits + gumbel, axis=-1)
            log_prob = _selected_log_prob(jax.nn.log_softmax(logits), action)
            if pooled:
                st_r = xs_t[2]
                # broadcast reset state for this step, pre-deserialized
                # outside the scan (envs/base.py presample_reset_states)
                obs2, env_state2, reward, term, trunc, _ = \
                    env.step_autoreset_presampled(keys, env_state, action,
                                                  st_r)
                if carry_counts:
                    counts = jnp.where((term | trunc)[:, None],
                                       xs_t[3][None, :], counts)
            elif resets == "fresh":
                obs2, env_state2, reward, term, trunc, info, cursor = \
                    env.step_autoreset_fresh(keys, env_state, action,
                                             buffer, cursor,
                                             window=fresh_window)
                # degraded-reset detector (envs/base.py autoreset_step_fresh
                # docstring): summed over the rollout into train metrics
                oflow = oflow + info["reset_overflow"]
            else:
                obs2, env_state2, reward, term, trunc, _ = step_env(
                    keys, env_state, action)
            done = term | trunc
            if recurrent:
                # zero the hidden state of finished envs: the next step's
                # forward starts the new episode from h=0
                h = h * (1.0 - done[:, None].astype(h.dtype))
            t = Transition(enc, action, log_prob, value, reward, done,
                           h_in if recurrent else None)
            return (env_state2, obs2, counts, cursor, h, oflow), t

        counts0 = _counts(obs["mission"]) if carry_counts else jnp.zeros(())
        key, k_act, k_step = jax.random.split(key, 3)
        step_keys = jax.random.split(k_step, T * B).reshape(T, B, 2)
        gumbel = jax.random.gumbel(k_act, (T, B, model.num_actions),
                                   jnp.float32)
        if pooled:
            key, k_pre = jax.random.split(key)
            st_r = presample_reset_states(k_pre, pool, cfg.rollout_len)
            xs = (step_keys, gumbel, st_r)
            if carry_counts:
                xs = xs + (_counts(st_r.mission),)
        else:
            xs = (step_keys, gumbel)
        if resets == "fresh":
            key, k_buf = jax.random.split(key)
            buffer = env.presample_fresh(k_buf, fresh_buffer)
        else:
            buffer = None
        (env_state, obs, counts0, _, h0, oflow), traj = jax.lax.scan(
            body,
            (env_state, obs, counts0, jnp.zeros((), jnp.int32), h0,
             jnp.zeros((), jnp.int32)), xs,
            length=cfg.rollout_len
        )
        return env_state, obs, key, traj, h0, oflow

    def gae(traj: Transition, last_value):
        def body(carry, t):
            adv_next, v_next = carry
            nonterm = 1.0 - t.done.astype(jnp.float32)
            delta = t.reward + cfg.gamma * v_next * nonterm - t.value
            adv = delta + cfg.gamma * cfg.gae_lambda * nonterm * adv_next
            return (adv, t.value), adv

        _, advs = jax.lax.scan(
            body, (jnp.zeros_like(last_value), last_value), traj, reverse=True
        )
        return advs, advs + traj.value

    def loss_fn(params, batch: Transition, adv, ret, h0=None):
        if recurrent:
            # replay the cell over the contiguous (mbt, B) slab from its
            # first step's STORED hidden (truncated BPTT; the stored h was
            # computed under the rollout's params — the standard
            # approximation), re-zeroing after in-slab episode ends.
            # Factored for the TPU (actor_critic.py ActorCriticRNN): all
            # h-independent projections batch over the whole slab before
            # the scan, the scan carries only the recurrent matmul +
            # gates, and the heads apply to the stacked hidden outputs —
            # the sequential chain holds ~1/4 of the forward FLOPs
            xz = model.apply(params, batch.obs, method="encode_inputs")

            def cell(h, xs):
                xz_t, done_t = xs
                h_new = model.apply(params, xz_t, h, method="gru_step")
                h = h_new * (1.0 - done_t[:, None].astype(h_new.dtype))
                return h, h_new

            _, hs = jax.lax.scan(cell, h0, (xz, batch.done))
            logits, value = model.apply(params, hs, method="heads")
        else:
            logits, value = model.apply(params, batch.obs)
        log_probs = jax.nn.log_softmax(logits)
        lp = _selected_log_prob(log_probs, batch.action)
        ratio = jnp.exp(lp - batch.log_prob)
        norm_adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * norm_adv
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * norm_adv
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_loss = 0.5 * jnp.square(value - ret).mean()
        entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
        total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
        return total, {
            "loss": total, "pg_loss": pg_loss, "v_loss": v_loss,
            "entropy": entropy,
        }

    def train_step_core(params, opt_state, env_state, obs, key, pool, h):
        env_state, obs, key, traj, h, oflow = rollout(
            params, env_state, obs, key, pool, h)
        if recurrent:
            (_, last_value), _ = model.apply(params, obs, h)
        else:
            _, last_value = model.apply(params, obs)
        adv, ret = gae(traj, last_value)

        T = cfg.rollout_len
        if recurrent:
            # only the rotate-slab START hiddens are replayed from
            # (truncated BPTT); subselect them (num_minibatches rows) and
            # drop the (T, B, H) buffer from the minibatch data so the
            # per-epoch slab slices never copy it
            mbt_r = T // cfg.num_minibatches
            slab_h = traj.hidden[::mbt_r]
            traj = traj._replace(hidden=None)
        else:
            slab_h = None
        data = (traj, adv, ret)

        def epoch(carry, _):
            params, opt_state, key = carry
            key, kperm = jax.random.split(key)

            if cfg.shuffle == "sample":
                # exact per-sample shuffling: a (T*B,) permutation gather.
                # On TPU each gathered row costs ~5 ns (serialized DMA), so
                # at 4096x128 this dominates the update phase — hence the
                # default below.
                flat = jax.tree.map(
                    lambda x: x.reshape(x.shape[0] * x.shape[1],
                                        *x.shape[2:]), data)
                n = T * adv.shape[1]
                perm = jax.random.permutation(kperm, n)
                mb = n // cfg.num_minibatches

                def get_mb(i):
                    idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                    return jax.tree.map(lambda x: x[idx], flat)
            elif cfg.shuffle == "timestep":
                # permute whole rollout steps — a gather of T contiguous
                # (B, ...) slabs — then cut contiguous minibatches. Each
                # minibatch holds T/num_minibatches random timesteps x all
                # B envs; with thousands of independent envs per timestep
                # this loses only within-timestep mixing relative to exact
                # shuffling (learning guards in tests/test_learning.py
                # hold). At 4096x128 with stored bf16 features the gather
                # costs ~9.6 ms/epoch — prefer "rotate".
                tperm = jax.random.permutation(kperm, T)
                shuf = jax.tree.map(lambda x: x[tperm], data)
                mbt = T // cfg.num_minibatches

                def get_mb(i):
                    sl = jax.tree.map(
                        lambda x: jax.lax.dynamic_slice_in_dim(
                            x, i * mbt, mbt), shuf)
                    return jax.tree.map(
                        lambda x: x.reshape(x.shape[0] * x.shape[1],
                                            *x.shape[2:]), sl)
            else:
                # "rotate" (default): zero-copy — minibatch i is the
                # contiguous timestep slab ((i + off) % n)*mbt, with a
                # fresh random rotation offset per epoch. The slab
                # *partition* is fixed (only the visiting order rotates),
                # but every train step fills the buffer with fresh data, so
                # partition composition is unbiased; each sample is used
                # exactly once per epoch. Measured: jnp.roll of the stored
                # feature buffer lowers to a 2x-padded copy (+7.1 ms) and
                # the timestep permutation to a 9.6 ms/epoch gather —
                # in-place slab cuts cost nothing (learning guards in
                # tests/test_learning.py + the DoorKey success-rate run
                # validate the reduced mixing).
                assert cfg.shuffle == "rotate", cfg.shuffle
                off = jax.random.randint(kperm, (), 0,
                                         cfg.num_minibatches)
                mbt = T // cfg.num_minibatches

                def get_mb(i):
                    # keep the (mbt, B, ...) shape: the loss is shape-
                    # polymorphic, and NOT merging the leading dims lets
                    # XLA feed the sliced slab to the matmuls without the
                    # (mbt*B, F) relayout copy
                    j = (i + off) % cfg.num_minibatches
                    sl = jax.tree.map(
                        lambda x: jax.lax.dynamic_slice_in_dim(
                            x, j * mbt, mbt), data)
                    if recurrent:  # this slab's stored start hidden
                        return sl + (jax.lax.dynamic_slice_in_dim(
                            slab_h, j, 1)[0],)
                    return sl

            def mini(carry, i):
                params, opt_state = carry
                batch, adv_mb, ret_mb, *h0 = get_mb(i)
                (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch, adv_mb, ret_mb, *h0
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                mini, (params, opt_state), jnp.arange(cfg.num_minibatches)
            )
            return (params, opt_state, key), metrics

        (params, opt_state, key), metrics = jax.lax.scan(
            epoch, (params, opt_state, key), None, length=cfg.num_epochs
        )
        metrics = jax.tree.map(lambda x: x.mean(), metrics)
        metrics["mean_reward"] = traj.reward.mean()
        if resets == "fresh":
            # resets that could not be untouched fresh rows this rollout
            # (window clamp or buffer exhaustion); nonzero means the
            # exact-distribution guarantee degraded — see
            # envs/base.py autoreset_step_fresh
            metrics["reset_overflow"] = oflow
        return params, opt_state, env_state, obs, key, metrics, h

    if recurrent:
        def train_step(params, opt_state, env_state, obs, h, key, pool=None):
            (params, opt_state, env_state, obs, key, metrics,
             h) = train_step_core(params, opt_state, env_state, obs, key,
                                  pool, h)
            return params, opt_state, env_state, obs, h, key, metrics
    else:
        def train_step(params, opt_state, env_state, obs, key, pool=None):
            (params, opt_state, env_state, obs, key, metrics,
             _) = train_step_core(params, opt_state, env_state, obs, key,
                                  pool, None)
            return params, opt_state, env_state, obs, key, metrics

    return train_step

"""Policy evaluation: measured episode success rate.

The learning guards in tests/ prove reward RISES; deployment cares whether
the trained policy actually solves the task. This harness runs N fresh
episodes to completion under the greedy (argmax) policy — batched, one
``lax.scan`` over the episode budget, no host round-trips — and reports
the fraction that terminate successfully (terminated with positive reward,
the universal MiniGrid success signal; timeouts and lava deaths count as
failures).

    from minigrid_tpu.models.eval import evaluate_success
    rate = evaluate_success(env, model, params, n_episodes=1024)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# jitted episode runners, keyed on everything that shapes the trace — a
# fresh closure per call would defeat jax.jit's cache and pay a full
# T-step-scan compile on every evaluation. Bounded FIFO: each cached
# closure pins its env/model and compiled executable alive, so sweeps
# over many distinct envs/configs would otherwise leak both host memory
# and device compile cache without eviction.
_RUN_CACHE: dict = {}
_RUN_CACHE_MAX = 32


def evaluate_success(env, model, params, n_episodes: int = 1024,
                     key: jax.Array | None = None,
                     max_steps: int | None = None,
                     require_all_done: bool = True) -> float:
    """Fraction of ``n_episodes`` fresh episodes the greedy policy solves.

    Finished episodes freeze (their state stops updating), so each episode
    is evaluated exactly once; the scan runs the env's ``max_steps`` budget
    (or an explicit cap) for the stragglers. Dynamic-budget envs (BabyAI
    levels, whose ``params.max_steps`` is a sentinel) derive the cap
    automatically from the evaluated batch's own per-episode budgets. With ``require_all_done``
    (default) the call raises if any episode is still running when the
    scan budget ends — otherwise unfinished episodes would silently count
    as failures; pass ``False`` to accept that as a conservative bound.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    T = max_steps or int(env.params.max_steps)
    k_reset, k_run = jax.random.split(key)
    # reset once outside the runner — the dynamic-budget path below needs
    # the batch anyway to derive T, and resetting again inside the jitted
    # scan would regenerate the identical layouts (BabyAI layout
    # generation dominates reset cost, so that doubled every eval)
    reset_key = (id(env), n_episodes)
    reset_fn = _RUN_CACHE.get(reset_key)
    if reset_fn is None:
        reset_fn = jax.jit(jax.vmap(env.reset))
        _cache_put(reset_key, reset_fn)
    obs0, st0 = reset_fn(jax.random.split(k_reset, n_episodes))
    if T > 1 << 16:
        # BabyAI RoomGridLevels keep a 2^30 sentinel in params.max_steps
        # and carry the real per-episode budget in state.extra["max_steps"]
        # (envs/babyai/core/level.py). Derive the scan cap from THIS
        # batch's sampled budgets (the max over the episodes being
        # evaluated — exactly long enough that none can be cut short);
        # pass ``max_steps`` to override.
        T = int(jnp.max(st0.extra["max_steps"]))

    cache_key = (id(env), id(model), T, n_episodes)
    run = _RUN_CACHE.get(cache_key)
    if run is not None:
        success_rate, done_rate = run(params, st0, obs0, k_run)
        return _finish(success_rate, done_rate, require_all_done, T)

    recurrent = bool(getattr(model, "is_recurrent", False))

    @jax.jit
    def run(params, st, obs, k_run):

        def body(carry, k):
            st, obs, h, done, success = carry
            if recurrent:
                (logits, _), h = model.apply(params, obs, h)
            else:
                logits, _ = model.apply(params, obs)
            action = jnp.argmax(logits, axis=-1)
            keys = jax.random.split(k, n_episodes)
            obs2, st2, r, te, tr, _ = jax.vmap(env.step)(keys, st, action)
            alive = ~done
            newly_done = alive & (te | tr)
            success = success | (newly_done & te & (r > 0))
            frozen = lambda x: done.reshape(
                (-1,) + (1,) * (x.ndim - 1))
            st = jax.tree.map(lambda a, b: jnp.where(frozen(a), a, b),
                              st, st2)
            obs = jax.tree.map(lambda a, b: jnp.where(frozen(a), a, b),
                               obs, obs2)
            done = done | te | tr
            return (st, obs, h, done, success), None

        h0 = model.initial_state(n_episodes) if recurrent else None
        done0 = jnp.zeros((n_episodes,), bool)
        (st, obs, _, done, success), _ = jax.lax.scan(
            body, (st, obs, h0, done0, jnp.zeros((n_episodes,), bool)),
            jax.random.split(k_run, T))
        return success.mean(), done.mean()

    _cache_put(cache_key, run)
    success_rate, done_rate = run(params, st0, obs0, k_run)
    return _finish(success_rate, done_rate, require_all_done, T)


def _cache_put(key, value):
    while len(_RUN_CACHE) >= _RUN_CACHE_MAX:  # FIFO eviction
        _RUN_CACHE.pop(next(iter(_RUN_CACHE)))
    _RUN_CACHE[key] = value


def _finish(success_rate, done_rate, require_all_done: bool, T: int):
    done = float(done_rate)
    if require_all_done and done < 1.0:
        raise ValueError(
            f"{(1 - done) * 100:.1f}% of episodes still running after the "
            f"{T}-step scan budget — raise max_steps (they would otherwise "
            "silently count as failures; pass require_all_done=False to "
            "accept the conservative bound)")
    return float(success_rate)

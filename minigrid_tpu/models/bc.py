"""Behavioral cloning from oracle-bot demonstrations.

Completes the imitation pipeline the BabyAI ecosystem is known for
(the original BabyAI platform trains imitation baselines from bot demos;
the reference package ships the bot but no learner): take a
:class:`~minigrid_tpu.utils.demos.DemoBatch` from
``utils/demos.generate_demos`` and fit the policy head of any
actor-critic model with masked cross-entropy — one jitted epoch scan, no
host round-trips after setup.

    from minigrid_tpu.utils.demos import generate_demos
    from minigrid_tpu.models.bc import behavior_clone
    demos = generate_demos(env, num_episodes=100)
    params, history = behavior_clone(model, params, demos)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax


def flatten_demos(demos) -> dict:
    """DemoBatch (N episodes, padded to T) -> flat sample arrays
    {image, direction, mission, action} of M valid timesteps."""
    mask = np.asarray(demos.mask)
    idx_n, idx_t = np.nonzero(mask)
    return {
        "image": np.asarray(demos.image)[idx_n, idx_t],
        "direction": np.asarray(demos.direction)[idx_n, idx_t],
        "mission": np.asarray(demos.mission)[idx_n],
        "action": np.asarray(demos.action)[idx_n, idx_t],
    }


def behavior_clone(model, params, demos, epochs: int = 10,
                   batch_size: int = 256, lr: float = 1e-3,
                   key: jax.Array | None = None):
    """Fit ``model``'s policy logits to the demo actions.

    Returns ``(params, history)`` where history lists per-epoch mean
    cross-entropy loss and imitation accuracy. The value head is left to
    its own devices (BC has no return targets); fine-tune with PPO after
    if needed. Samples are shuffled once on the host and cut into
    ``batch_size`` minibatches; the whole epoch runs as one jitted scan.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    flat = flatten_demos(demos)
    M = flat["action"].shape[0]
    batch_size = min(batch_size, M)  # small demo sets: one short batch
    n_batches = max(1, M // batch_size)
    keep = n_batches * batch_size
    perm = np.asarray(jax.random.permutation(key, M))[:keep]
    data = {k: jnp.asarray(v[perm]).reshape(n_batches, batch_size,
                                            *v.shape[1:])
            for k, v in flat.items()}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params, batch):
        obs = {k: batch[k] for k in ("image", "direction", "mission")}
        logits, _ = model.apply(params, obs)
        logp = jax.nn.log_softmax(logits)
        oh = batch["action"][:, None] == jnp.arange(logits.shape[-1])
        ce = -jnp.where(oh, logp, 0.0).sum(-1).mean()
        acc = (jnp.argmax(logits, -1) == batch["action"]).mean()
        return ce, acc

    @jax.jit
    def epoch(params, opt_state):
        def mini(carry, batch):
            params, opt_state = carry
            (ce, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (ce, acc)

        (params, opt_state), (ces, accs) = jax.lax.scan(
            mini, (params, opt_state), data)
        return params, opt_state, ces.mean(), accs.mean()

    history = []
    for _ in range(epochs):
        params, opt_state, ce, acc = epoch(params, opt_state)
        history.append({"loss": float(ce), "accuracy": float(acc)})
    return params, history

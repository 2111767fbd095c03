"""Flagship actor-critic policy network.

The reference ships no models (SURVEY.md §2: training lives in external
rl-starter-files); a TPU-native framework needs a first-class learner, so
this is the batteries-included policy for the batched envs: symbolic-view
encoder (one-hot of the type/color/state planes, padded to 24 per cell —
the reference's OneHotPartialObsWrapper encoding, wrappers.py:217-285,
plus sublane-alignment pad columns), mission
conditioning by masked mean-pooled token embeddings, direction one-hot,
dense trunk in bfloat16 so the matmuls ride the MXU, and separate
policy/value heads.

Gather-free by design: nn.Embed lookups lower to row gathers, which
serialize per row on TPU (~5 ns/row — profiled at >100 ms per PPO minibatch
at 131k samples). Instead the view planes become fused one-hot compares
feeding a dense matmul, and the mission mean-pool is computed as a
vocabulary-count contraction: mean(E[t] for t in tokens, t != pad)
== (counts @ E) / n, where ``counts`` comes from a compare+reduce that XLA
fuses without materializing the (L, V) one-hot.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.actions import NUM_ACTIONS
from minigrid_tpu.core.mission import VOCAB_SIZE

# one-hot widths for the three symbolic planes, padded from the semantic
# 11/6/3 to 12/8/4: the indices never reach the pad columns (always-zero
# features, dead weight rows), but a 24-wide per-cell block keeps the
# (V, V, 24) -> (V*V*24) flatten sublane-aligned so it lowers to a free
# bitcast instead of a re-tiling copy (profiled at 2x 1.26 ms per rollout
# for the 20-wide layout, which pads 20 -> 24 sublanes inside every tile)
N_TYPE, N_COLOR, N_STATE = 12, 8, 4
assert N_TYPE >= C.NUM_OBJECTS and N_COLOR >= C.NUM_COLORS and N_STATE >= 3
CELL_FEATURES = N_TYPE + N_COLOR + N_STATE  # 24


def _encode_planes(t, c, s, dtype):
    """(..., V, V) index planes -> (..., V*V*CELL_FEATURES) one-hot features."""
    feat = jnp.concatenate([
        jax.nn.one_hot(t, N_TYPE, dtype=dtype),
        jax.nn.one_hot(c, N_COLOR, dtype=dtype),
        jax.nn.one_hot(s, N_STATE, dtype=dtype),
    ], axis=-1)
    return feat.reshape(*feat.shape[:-3], -1)


def encode_image(image: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(..., V, V, 3) uint8 -> (..., V*V*24) one-hot features
    (24 = CELL_FEATURES, the sublane-padded 12/8/4 type/color/state widths)."""
    return _encode_planes(image[..., 0], image[..., 1], image[..., 2], dtype)


def encode_packed(cells: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(..., V, V) packed int32 -> the same (..., V*V*24) features (the
    packed cell id is type | color<<4 | state<<7, core/obs.py)."""
    return _encode_planes(cells & 15, (cells >> 4) & 7, (cells >> 7) & 3,
                          dtype)


def encode_obs(obs: dict, dtype=jnp.uint8) -> dict:
    """Raw env observation -> the policy's parameter-free input encoding:
    ``{"img_feat": uint8 0/1 (..., V*V*24), "mission_counts": uint8
    (..., VOCAB), "direction": int32}``.

    This is the form the PPO rollout stores in its trajectory buffer: the
    one-hot planes, the lane-padded flatten copy, and the token-count
    compare+reduce each run ONCE per collected sample (shared with the
    behaviour-policy forward) instead of once more per epoch x minibatch in
    the update phase — profiled at ~2.6 ms of the 6.1 ms minibatch on the
    chip. Features are uint8 (values exactly 0/1): half the HBM traffic of
    bf16 through the buffer write, minibatch slice, and layout copies, and
    the MXU matmuls convert u8 operands inside the matmul fusion (verified
    in the profile), so no bf16 copy is ever materialized. ``__call__``
    consumes either this encoding or raw observations.
    """
    if "img_feat" in obs:
        return obs
    if "packed" in obs:
        feat = encode_packed(obs["packed"], dtype)
    else:
        feat = encode_image(obs["image"], dtype)
    if "mission_counts" in obs:
        counts = obs["mission_counts"]
    else:
        tokens = obs["mission"]
        counts = (tokens[..., None] == jnp.arange(VOCAB_SIZE)).sum(-2)
        counts = counts.astype(jnp.uint8)
    return {"img_feat": feat, "mission_counts": counts,
            "direction": obs["direction"]}


def _trunk_input(mod: nn.Module, obs: dict, img_dense=None,
                 table=None) -> jax.Array:
    """Shared encoder front: view features through the ``img_in`` dense,
    mission conditioning, direction one-hot, concatenated. Called from
    inside a module's ``@nn.compact`` ``__call__`` (parameter names
    ``img_in``/``mission_embed`` land in the calling module's scope) so
    the MLP and recurrent heads can never drift apart; setup-style
    modules (the recurrent policy) pass their pre-built ``img_dense``
    submodule and ``table`` param instead.

    Mission conditioning is a masked mean-pool of token embeddings,
    computed as a count contraction (see module docstring); column 0 is
    the pad token and is excluded from counts and normalization. Accepts
    precomputed "mission_counts" (uint8 vocabulary counts — the PPO
    rollout stores these instead of raw tokens: 64 B/sample instead of
    384 B, same pooled embedding exactly). Counts convert straight to the
    compute dtype (they are <= MISSION_LEN, exact in bf16), so the uint8
    rollout buffer converts inside the minibatch slice fusion instead of
    via an s32 intermediate.
    """
    if "img_feat" in obs:
        img = obs["img_feat"].astype(mod.dtype)
    elif "packed" in obs:
        img = encode_packed(obs["packed"], mod.dtype)
    else:
        img = encode_image(obs["image"], mod.dtype)
    if img_dense is None:
        img_dense = nn.Dense(mod.hidden, dtype=mod.dtype, name="img_in")
    x = nn.relu(img_dense(img))

    if "mission_counts" in obs:
        counts = obs["mission_counts"]
    else:
        tokens = obs["mission"]
        counts = (tokens[..., None] == jnp.arange(VOCAB_SIZE)).sum(-2)
    counts = counts.astype(mod.dtype) * (jnp.arange(VOCAB_SIZE) != 0)
    n = counts.sum(-1, keepdims=True)
    if table is None:
        table = mod.param(
            "mission_embed", nn.initializers.normal(stddev=1.0),
            (VOCAB_SIZE, mod.mission_dim))
    pooled = (counts @ table.astype(mod.dtype)) / jnp.maximum(n, 1)

    d = jax.nn.one_hot(obs["direction"], 4, dtype=mod.dtype)
    return jnp.concatenate([x, pooled, d], axis=-1)


class ActorCritic(nn.Module):
    hidden: int = 256
    mission_dim: int = 64
    num_actions: int = NUM_ACTIONS
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: dict):
        x = _trunk_input(self, obs)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="trunk1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="trunk2")(x)
        x = nn.relu(x)

        logits = nn.Dense(self.num_actions, dtype=jnp.float32, name="policy")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        return logits, value.squeeze(-1)


def init_params(key, view_size: int = 7, mission_len: int = 64,
                model: ActorCritic | None = None, packed: bool = False):
    model = model or ActorCritic()
    if packed:
        view = {"packed": jnp.zeros((1, view_size, view_size), jnp.int32)}
    else:
        view = {"image": jnp.zeros((1, view_size, view_size, 3), jnp.uint8)}
    obs = view | {
        "direction": jnp.zeros((1,), jnp.int32),
        "mission": jnp.zeros((1, mission_len), jnp.int32),
    }
    return model.init(key, obs)


class ActorCriticRNN(nn.Module):
    """Recurrent actor-critic: the same parameter-free encoders feeding a
    GRU whose hidden state carries across steps — the policy family the
    reference ecosystem reaches for on memory tasks (rl-starter-files'
    ``--recurrence``; e.g. the Memory envs are unsolvable for a
    memoryless policy: the clue object leaves the 7x7 view before the
    choice point).

    Functional cell interface (state is explicit, like the envs):

        h0 = model.initial_state(batch)                  # (B, hidden)
        (logits, value), h1 = model.apply(params, obs, h0)

    The PPO driver (models/ppo.py) detects ``is_recurrent`` and threads
    the hidden state through rollout and update: resets zero it per env,
    and minibatch slabs replay the GRU from the hidden state stored at
    the slab's first step (standard truncated BPTT over contiguous
    timestep slabs — exactly the shape the default "rotate" minibatch
    partition provides).

    The cell is factored for the TPU BPTT hot loop: every h-independent
    projection — view features, mission pooling, trunk, and the GRU's
    input-side 3H matmul — lives in :meth:`encode_inputs`, batched over
    whole (T, B) slabs in the update phase; the sequential scan carries
    only :meth:`gru_step` (one (B, H) x (H, 3H) matmul + gates), and the
    policy/value heads apply to the stacked hidden outputs afterwards.
    A time step in the BPTT scan therefore serializes ~1/4 of the
    forward's FLOPs, and the rest runs as full-slab MXU matmuls.
    """

    hidden: int = 256
    mission_dim: int = 64
    num_actions: int = NUM_ACTIONS
    dtype: jnp.dtype = jnp.bfloat16
    is_recurrent: bool = True

    def setup(self):
        H = self.hidden
        self.img_in = nn.Dense(H, dtype=self.dtype)
        self.mission_embed = self.param(
            "mission_table", nn.initializers.normal(stddev=1.0),
            (VOCAB_SIZE, self.mission_dim))
        self.trunk1 = nn.Dense(H, dtype=self.dtype)
        # GRU, input/hidden split (canonical form): the x-side biases live
        # in gru_x; gru_h is bias-free except the candidate-gate bias bhn,
        # which sits inside the reset-gated term r * (Whn h + bhn)
        self.gru_x = nn.Dense(3 * H, dtype=self.dtype)
        self.gru_h = nn.Dense(3 * H, dtype=self.dtype, use_bias=False)
        self.bhn = self.param("bhn", nn.initializers.zeros, (H,))
        self.policy = nn.Dense(self.num_actions, dtype=jnp.float32)
        self.value = nn.Dense(1, dtype=jnp.float32)

    def encode_inputs(self, obs: dict) -> jax.Array:
        """All h-independent projections: raw/encoded observations ->
        (..., 3H) GRU input pre-activations. Shape-polymorphic over any
        leading axes, so the update phase runs it once per (mbt, B) slab."""
        x = _trunk_input(self, obs, img_dense=self.img_in,
                         table=self.mission_embed)
        x = nn.relu(self.trunk1(x))
        return self.gru_x(x)

    def gru_step(self, xz: jax.Array, h: jax.Array) -> jax.Array:
        """One recurrent step: (…, 3H) input pre-activations + (…, H)
        hidden -> new hidden. The only computation the BPTT scan carries."""
        H = self.hidden
        hz = self.gru_h(h)
        r = nn.sigmoid(xz[..., :H] + hz[..., :H])
        z = nn.sigmoid(xz[..., H:2 * H] + hz[..., H:2 * H])
        n = jnp.tanh(xz[..., 2 * H:]
                     + r * (hz[..., 2 * H:] + self.bhn.astype(hz.dtype)))
        return (1.0 - z) * n + z * h

    def heads(self, h: jax.Array):
        """Policy logits + value from (stacked) hidden outputs."""
        return self.policy(h), self.value(h).squeeze(-1)

    def __call__(self, obs: dict, h: jax.Array):
        h = self.gru_step(self.encode_inputs(obs), h)
        return self.heads(h), h

    def initial_state(self, batch: int) -> jax.Array:
        return jnp.zeros((batch, self.hidden), self.dtype)


def init_params_rnn(key, view_size: int = 7, mission_len: int = 64,
                    model: ActorCriticRNN | None = None,
                    packed: bool = False):
    model = model or ActorCriticRNN()
    if packed:
        view = {"packed": jnp.zeros((1, view_size, view_size), jnp.int32)}
    else:
        view = {"image": jnp.zeros((1, view_size, view_size, 3), jnp.uint8)}
    obs = view | {
        "direction": jnp.zeros((1,), jnp.int32),
        "mission": jnp.zeros((1, mission_len), jnp.int32),
    }
    return model.init(key, obs, model.initial_state(1))

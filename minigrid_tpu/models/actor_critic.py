"""Flagship actor-critic policy network.

The reference ships no models (SURVEY.md §2: training lives in external
rl-starter-files); a TPU-native framework needs a first-class learner, so
this is the batteries-included policy for the batched envs: symbolic-view
encoder (one-hot of the type/color/state planes — the same 20-bit encoding as
the reference's OneHotPartialObsWrapper, wrappers.py:217-285), mission-token
embedding with mean pooling (BabyAI instruction conditioning), direction
one-hot, dense trunk in bfloat16 so the matmuls ride the MXU, and separate
policy/value heads.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.actions import NUM_ACTIONS
from minigrid_tpu.core.mission import VOCAB_SIZE

# one-hot widths for the three symbolic planes
N_TYPE, N_COLOR, N_STATE = C.NUM_OBJECTS, C.NUM_COLORS, 3
# packed-cell vocabulary: the 9 observation bits (core/obs.py gen_obs)
N_PACKED = 512


def encode_image(image: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(..., V, V, 3) uint8 -> (..., V*V*20) one-hot features."""
    t = jax.nn.one_hot(image[..., 0], N_TYPE, dtype=dtype)
    c = jax.nn.one_hot(image[..., 1], N_COLOR, dtype=dtype)
    s = jax.nn.one_hot(image[..., 2], N_STATE, dtype=dtype)
    feat = jnp.concatenate([t, c, s], axis=-1)
    return feat.reshape(*feat.shape[:-3], -1)


class ActorCritic(nn.Module):
    hidden: int = 256
    mission_dim: int = 64
    cell_dim: int = 20  # per-cell embedding width in packed-obs mode
    num_actions: int = NUM_ACTIONS
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: dict):
        if "packed" in obs:
            # packed mode (EnvParams.packed_obs): embed the 9-bit cell id
            # directly — information-equivalent to the 20-wide one-hot of
            # the image path (type x color x state factors through the id)
            # with no unpack/stack on the env side.
            emb = nn.Embed(N_PACKED, self.cell_dim, dtype=self.dtype,
                           name="cell_embed")(obs["packed"])
            img = emb.reshape(*emb.shape[:-3], -1)
        else:
            img = encode_image(obs["image"], self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="img_in")(img)
        x = nn.relu(x)

        # mission conditioning: embed tokens, masked mean-pool
        tokens = obs["mission"]
        emb = nn.Embed(VOCAB_SIZE, self.mission_dim, dtype=self.dtype,
                       name="mission_embed")(tokens)
        mask = (tokens != 0).astype(self.dtype)[..., None]
        pooled = (emb * mask).sum(-2) / jnp.maximum(mask.sum(-2), 1.0)

        d = jax.nn.one_hot(obs["direction"], 4, dtype=self.dtype)
        x = jnp.concatenate([x, pooled, d], axis=-1)

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

"""Core state/params types.

The reference represents the world as a Python list of heap ``WorldObj``
instances plus scalar attributes on the env object
(``minigrid/core/grid.py:35``, ``minigrid/minigrid_env.py:105-111``). Here the
entire environment state is a pytree of fixed-shape arrays, so episodes can be
stacked with ``jax.vmap``, stepped under ``jit``, sharded with ``pjit`` and
checkpointed by serializing arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from minigrid_tpu.core import constants as C

# Fixed token length for tokenized mission strings (longest BabyAI mission in
# the registry fits; host-side realization is in core/mission.py).
MISSION_LEN = 96


@struct.dataclass
class EnvState:
    """Complete, array-valued environment state (one episode instance)."""

    grid: jax.Array        # (W, H, 5) uint8 — see constants.NUM_CHANNELS
    agent_pos: jax.Array   # (2,) int32 — (x, y)
    agent_dir: jax.Array   # () int32 — 0..3
    carrying: jax.Array    # (5,) uint8 — carried cell; EMPTY_CELL when empty
    step_count: jax.Array  # () int32
    terminated: jax.Array  # () bool
    truncated: jax.Array   # () bool
    mission: jax.Array     # (MISSION_LEN,) int32 token ids (0 = pad)
    rng: jax.Array         # PRNG key for in-episode stochastic dynamics
    extra: Any = None      # env-family-specific pytree (e.g. obstacle slots)


@dataclasses.dataclass(frozen=True)
class EnvParams:
    """Static (trace-time) configuration shared by every environment.

    Mirrors the constructor surface of the reference base env
    (``minigrid/minigrid_env.py:34-117``) minus the rendering knobs, which
    live in ``minigrid_tpu.render``.
    """

    width: int = 8
    height: int = 8
    view_size: int = 7
    max_steps: int = 100
    see_through_walls: bool = False
    # Observation format. False: the reference's {image: (V,V,3) uint8}
    # contract. True: the view ships as one packed int32 lane per cell
    # ({packed: (V,V)}, 9 bits = type|color<<4|state<<7) — no unpack/stack
    # on the hot path; models embed the packed cell id directly
    # (models/actor_critic.py). Not for use under the image wrappers.
    packed_obs: bool = False

    def __post_init__(self):
        assert self.view_size % 2 == 1 and self.view_size >= 3


def is_carrying(state: EnvState) -> jax.Array:
    return state.carrying[0] != C.EMPTY


def pack_cell(type_idx, color_idx=0, state_idx=0, cont_type=0, cont_color=0):
    """Build a (5,) uint8 cell vector from scalars (traced or static)."""
    return jnp.stack(
        [
            jnp.asarray(type_idx, jnp.uint8),
            jnp.asarray(color_idx, jnp.uint8),
            jnp.asarray(state_idx, jnp.uint8),
            jnp.asarray(cont_type, jnp.uint8),
            jnp.asarray(cont_color, jnp.uint8),
        ]
    )


# Type aliases for the functional env API.
Obs = dict[str, jax.Array]
ResetFn = Callable[..., tuple[Obs, EnvState]]
StepFn = Callable[..., tuple[Obs, EnvState, jax.Array, jax.Array, jax.Array, dict]]

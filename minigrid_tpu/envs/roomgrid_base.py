"""Env base for RoomGrid-derived environments."""

from __future__ import annotations

import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import roomgrid as RG
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.step import reward_on_success
from minigrid_tpu.core.types import EnvParams
from minigrid_tpu.envs.base import MiniGridEnv


class RoomGridEnv(MiniGridEnv):
    """Multi-room base (reference core/roomgrid.py:66-102)."""

    def __init__(self, room_size=7, num_rows=3, num_cols=3, max_steps=100,
                 agent_view_size=7, **kw):
        self.layout = RG.RoomLayout(room_size, num_rows, num_cols)
        super().__init__(
            EnvParams(
                width=self.layout.width,
                height=self.layout.height,
                view_size=agent_view_size,
                max_steps=max_steps,
                see_through_walls=False,
                **kw,
            )
        )

    def default_mission(self) -> str:
        return ""

    def finish(self, b: RG.Builder, key, mission=None, extra=None):
        return self.make_state(b.grid, b.agent_pos, b.agent_dir, rng=key,
                               mission=mission, extra=extra)


class PickupTargetMixin:
    """Shared step override: episode succeeds on picking up THE target
    object (e.g. envs/keycorridor.py:128-135, unlockpickup.py:97-105).
    Expects extra = {target_type, target_color}; target (type, color) pairs
    are unique by construction in these envs, so value equality matches the
    reference's object identity check."""

    def _post_step(self, prev, state, action, reward, terminated):
        match = (
            (state.carrying[0] == state.extra["target_type"])
            & (state.carrying[1] == state.extra["target_color"])
        )
        success = (action == Actions.pickup) & match
        reward = jnp.where(
            success, reward_on_success(self.params, state.step_count), reward
        )
        return state, reward, terminated | success

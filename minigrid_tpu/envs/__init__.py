"""Environment catalog (mirrors minigrid/envs/__init__.py exports)."""

from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.doorkey import DoorKeyEnv
from minigrid_tpu.envs.empty import EmptyEnv

__all__ = ["MiniGridEnv", "DoorKeyEnv", "EmptyEnv"]

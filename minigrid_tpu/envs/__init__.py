"""Environment catalog (mirrors minigrid/envs/__init__.py exports)."""

from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.crossing import CrossingEnv
from minigrid_tpu.envs.distshift import DistShiftEnv
from minigrid_tpu.envs.doorkey import DoorKeyEnv
from minigrid_tpu.envs.dynamicobstacles import DynamicObstaclesEnv
from minigrid_tpu.envs.empty import EmptyEnv
from minigrid_tpu.envs.fetch import FetchEnv
from minigrid_tpu.envs.fourrooms import FourRoomsEnv
from minigrid_tpu.envs.gotodoor import GoToDoorEnv
from minigrid_tpu.envs.gotoobject import GoToObjectEnv
from minigrid_tpu.envs.keycorridor import KeyCorridorEnv
from minigrid_tpu.envs.lavagap import LavaGapEnv
from minigrid_tpu.envs.lockedroom import LockedRoomEnv
from minigrid_tpu.envs.memory import MemoryEnv
from minigrid_tpu.envs.multiroom import MultiRoomEnv
from minigrid_tpu.envs.obstructedmaze import (
    ObstructedMaze_1Dlhb,
    ObstructedMaze_Full,
    ObstructedMazeEnv,
)
from minigrid_tpu.envs.playground import PlaygroundEnv
from minigrid_tpu.envs.putnear import PutNearEnv
from minigrid_tpu.envs.redbluedoors import RedBlueDoorEnv
from minigrid_tpu.envs.roomgrid_base import RoomGridEnv
from minigrid_tpu.envs.unlock import (
    BlockedUnlockPickupEnv,
    UnlockEnv,
    UnlockPickupEnv,
)

__all__ = [
    "MiniGridEnv", "CrossingEnv", "DistShiftEnv", "DoorKeyEnv",
    "DynamicObstaclesEnv", "EmptyEnv", "FetchEnv", "FourRoomsEnv",
    "GoToDoorEnv", "GoToObjectEnv", "KeyCorridorEnv", "LavaGapEnv",
    "LockedRoomEnv", "MemoryEnv", "MultiRoomEnv", "ObstructedMazeEnv",
    "ObstructedMaze_1Dlhb", "ObstructedMaze_Full", "PlaygroundEnv",
    "PutNearEnv", "RedBlueDoorEnv", "RoomGridEnv", "UnlockEnv",
    "UnlockPickupEnv", "BlockedUnlockPickupEnv",
]

"""ID registration for the full environment catalog.

Mirrors the reference registry (``minigrid/__init__.py:13-1131``): each ID
maps to an env class plus frozen kwargs. Grows with the build; the final
catalog covers 76 MiniGrid + 96 BabyAI + 6 WFC ids.
"""

from __future__ import annotations

from minigrid_tpu.registry import register

_done = False


def register_all() -> None:
    global _done
    if _done:
        return
    _done = True

    from minigrid_tpu.envs.doorkey import DoorKeyEnv
    from minigrid_tpu.envs.empty import EmptyEnv

    # DoorKey (reference minigrid/__init__.py:93-115)
    register("MiniGrid-DoorKey-5x5-v0", DoorKeyEnv, size=5)
    register("MiniGrid-DoorKey-6x6-v0", DoorKeyEnv, size=6)
    register("MiniGrid-DoorKey-8x8-v0", DoorKeyEnv, size=8)
    register("MiniGrid-DoorKey-16x16-v0", DoorKeyEnv, size=16)

    # Empty (reference minigrid/__init__.py:117-160)
    register("MiniGrid-Empty-5x5-v0", EmptyEnv, size=5)
    register("MiniGrid-Empty-Random-5x5-v0", EmptyEnv, size=5, agent_start_pos=None)
    register("MiniGrid-Empty-6x6-v0", EmptyEnv, size=6)
    register("MiniGrid-Empty-Random-6x6-v0", EmptyEnv, size=6, agent_start_pos=None)
    register("MiniGrid-Empty-8x8-v0", EmptyEnv)
    register("MiniGrid-Empty-16x16-v0", EmptyEnv, size=16)

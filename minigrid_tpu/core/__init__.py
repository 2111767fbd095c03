from minigrid_tpu.core import constants, grid, mission, obs, place, step, types, visibility

__all__ = [
    "constants", "grid", "mission", "obs", "place", "step", "types", "visibility",
]

from minigrid_tpu.render.frame import (
    compose_frame,
    get_frame,
    get_full_render,
    get_pov_render,
)
from minigrid_tpu.render.tiles import get_atlas

__all__ = [
    "compose_frame", "get_frame", "get_full_render", "get_pov_render",
    "get_atlas",
]

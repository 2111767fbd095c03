"""Host-side state introspection helpers.

Functional counterparts of the reference's debugging/inspection API:
``pprint_grid`` (minigrid_env.py:175-234), ``get_view_coords``/
``relative_coords``/``in_view``/``agent_sees`` (minigrid_env.py:426-523).
"""

from __future__ import annotations

import numpy as np

from minigrid_tpu.core import constants as C

OBJECT_TO_STR = {
    "wall": "W", "floor": "F", "door": "D", "key": "K", "ball": "A",
    "box": "B", "goal": "G", "lava": "V",
}
AGENT_DIR_TO_STR = {0: ">", 1: "V", 2: "<", 3: "^"}


def pprint_grid(state) -> str:
    """Two-chars-per-cell ASCII dump, identical format to the reference."""
    grid = np.asarray(state.grid)
    agent_pos = np.asarray(state.agent_pos)
    agent_dir = int(state.agent_dir)
    W, H = grid.shape[:2]
    out = []
    for j in range(H):
        row = ""
        for i in range(W):
            if i == agent_pos[0] and j == agent_pos[1]:
                row += 2 * AGENT_DIR_TO_STR[agent_dir]
                continue
            t, color, st = grid[i, j, 0], grid[i, j, 1], grid[i, j, 2]
            tname = C.IDX_TO_OBJECT[int(t)]
            if tname == "empty":
                row += "  "
                continue
            if tname == "door":
                if st == C.OPEN:
                    row += "__"
                elif st == C.LOCKED:
                    row += "L" + C.IDX_TO_COLOR[int(color)][0].upper()
                else:
                    row += "D" + C.IDX_TO_COLOR[int(color)][0].upper()
                continue
            row += OBJECT_TO_STR[tname] + C.IDX_TO_COLOR[int(color)][0].upper()
        out.append(row)
    return "\n".join(out)


def get_view_coords(params, state, i: int, j: int):
    """World (i, j) -> agent-view coordinates (may be out of view)."""
    ax, ay = (int(x) for x in np.asarray(state.agent_pos))
    d = C.DIR_TO_VEC[int(state.agent_dir)]
    dx, dy = int(d[0]), int(d[1])
    rx, ry = -dy, dx
    sz = params.view_size
    hs = sz // 2
    tx = ax + dx * (sz - 1) - rx * hs
    ty = ay + dy * (sz - 1) - ry * hs
    lx, ly = i - tx, j - ty
    vx = rx * lx + ry * ly
    vy = -(dx * lx + dy * ly)
    return vx, vy


def relative_coords(params, state, x: int, y: int):
    vx, vy = get_view_coords(params, state, x, y)
    if vx < 0 or vy < 0 or vx >= params.view_size or vy >= params.view_size:
        return None
    return vx, vy


def in_view(params, state, x: int, y: int) -> bool:
    return relative_coords(params, state, x, y) is not None


def agent_sees(params, state, x: int, y: int) -> bool:
    """Whether a non-empty world cell is visible to the agent right now
    (minigrid_env.py:505-523)."""
    from minigrid_tpu.core.obs import gen_obs

    coords = relative_coords(params, state, x, y)
    if coords is None:
        return False
    vx, vy = coords
    obs = gen_obs(params, state)
    obs_cell = int(np.asarray(obs["image"])[vx, vy, 0])
    world_cell = int(np.asarray(state.grid)[x, y, 0])
    assert world_cell != C.EMPTY
    return obs_cell != C.UNSEEN and obs_cell == world_cell

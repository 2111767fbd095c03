"""WFC maze environment (reference minigrid/envs/wfc/wfcenv.py:30-283).

Per reset (all jittable): run the WFC solver on the preset's pattern
catalog -> black/white layout -> keep the largest connected empty-cell
component (the reference's networkx pipeline, wfcenv.py:240-269, becomes a
min-label flood) -> place agent and goal at random distinct component cells
-> pad with the boundary wall ring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.types import EnvParams
from minigrid_tpu.envs import common as X
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc
from minigrid_tpu.envs.wfc import patterns as P
from minigrid_tpu.envs.wfc import solver as S
from minigrid_tpu.envs.wfc.config import WFC_PRESETS_ALL, WFCConfig


def largest_component(empty: jnp.ndarray) -> jnp.ndarray:
    """(H, W) bool mask of the largest 4-connected True component."""
    H, W = empty.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    INF = H * W
    labels = jnp.where(empty, idx, INF)

    def propagate(lab):
        up = jnp.pad(lab[:-1, :], ((1, 0), (0, 0)), constant_values=INF)
        down = jnp.pad(lab[1:, :], ((0, 1), (0, 0)), constant_values=INF)
        left = jnp.pad(lab[:, :-1], ((0, 0), (1, 0)), constant_values=INF)
        right = jnp.pad(lab[:, 1:], ((0, 0), (0, 1)), constant_values=INF)
        best = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.where(empty, jnp.minimum(lab, best), INF)

    # converge instead of running the H*W worst-case bound: typical WFC
    # mazes settle in ~diameter iterations, cutting reset cost several-fold
    def cond(carry):
        lab, changed = carry
        return changed

    def step(carry):
        lab, _ = carry
        new = propagate(lab)
        return new, (new != lab).any()

    labels, _ = jax.lax.while_loop(cond, step, (labels, jnp.bool_(True)))
    sizes = jnp.zeros(H * W + 1, jnp.int32).at[labels.reshape(-1)].add(
        empty.reshape(-1).astype(jnp.int32))
    sizes = sizes.at[INF].set(0)
    biggest = jnp.argmax(sizes)
    return labels == biggest


class WFCEnv(MiniGridEnv):
    name = "WFC"
    __doc__ = env_doc(
        """
        Every reset synthesizes a fresh maze with Wave Function Collapse:
        local patterns extracted from a small template image are tiled
        into a new layout that is locally consistent with the template,
        then the largest connected region is kept and start/goal cells are
        placed inside it. 22 preset pattern catalogs ship with the
        framework (6 of them registered as ids); heuristics, backtracking
        and global constraints are configurable via ``WFCConfig``.
        Reference: minigrid/envs/wfc/wfcenv.py and wfclogic/.
        """,
        '"traverse the maze to get to the goal"',
        used=(0, 1, 2),
        termination=("The agent reaches the goal.",
                     "Timeout (see `max_steps`)."),
        configurations="""
        Registered ids select a preset, e.g.
        ``MiniGrid-WFC-MazeSimple-v0``; every shipped preset is available
        through ``WFCEnv(wfc_config=...)``.
        """,
    )

    PATTERN_COLOR_CONFIG = {"wall": 0, "empty": 255}

    def __init__(self, wfc_config: WFCConfig | str = "MazeSimple", size=25,
                 ensure_connected=True, max_steps=None, **kw):
        self.config = (wfc_config if isinstance(wfc_config, WFCConfig)
                       else WFC_PRESETS_ALL[wfc_config])
        if size < 3:
            raise ValueError(f"Grid size must be at least 3 (currently {size})")
        if max_steps is None:
            max_steps = size * 20
        super().__init__(EnvParams(width=size, height=size,
                                   max_steps=max_steps, **kw))
        self.ensure_connected = ensure_connected
        self.max_attempts = 64

        pats, weights, tiles = P.build_catalog(
            self.config.image, self.config.pattern_width,
            self.config.rotations, self.config.input_periodic)
        self._patterns = jnp.asarray(pats)
        self._weights = jnp.asarray(weights)
        self._adj = jnp.asarray(P.build_adjacency(pats))
        # pattern -> wall iff its top-left tile is black (wfcenv.py:227-238)
        tiles_arr = np.asarray(tiles)
        black = (tiles_arr == self.PATTERN_COLOR_CONFIG["wall"]
                 if tiles_arr.ndim == 1
                 else (tiles_arr == self.PATTERN_COLOR_CONFIG["wall"]).all(-1))
        self._is_wall = jnp.asarray(black[pats[:, 0, 0]])

    def default_mission(self) -> str:
        return "traverse the maze to get to the goal"

    def _gen_grid(self, key):
        p = self.params
        keys = jax.random.split(key, 5)
        inner = (p.height - 2, p.width - 2)

        pat_grid, ok = S.solve_with_retries(
            keys[0], self._adj, self._weights, inner,
            self.config.output_periodic, self.max_attempts,
            loc_heuristic=self.config.loc_heuristic,
            choice_heuristic=self.config.choice_heuristic,
            backtracking=self.config.backtracking,
            global_constraint=self.config.global_constraint)
        wall = self._is_wall[pat_grid]  # (H-2, W-2) [row, col]

        empty = ~wall
        if self.ensure_connected:
            comp = largest_component(empty)
            wall = wall | (empty & ~comp)
            empty = comp

        # random distinct start/goal on the component (wfcenv.py:271-282)
        flat_logits = jnp.where(empty.reshape(-1), 0.0, -1e9)
        start = jax.random.categorical(keys[1], flat_logits)
        goal_logits = flat_logits.at[start].set(-1e9)
        goal = jax.random.categorical(keys[2], goal_logits)

        H, W = inner
        # assemble the padded grid; inner layout indexed [row, col] maps to
        # grid[x=col+1, y=row+1]
        grid = G.wall_rect(G.empty_grid(p.width, p.height), 0, 0,
                           p.width, p.height)
        wall_xy = wall.T  # -> [x, y]
        inner_cells = jnp.where(
            wall_xy[..., None], jnp.asarray(C.WALL_CELL),
            jnp.asarray(C.EMPTY_CELL))
        grid = grid.at[1:p.width - 1, 1:p.height - 1].set(inner_cells)

        gy, gx = goal // W, goal % W
        grid = G.set_cell(grid, gx + 1, gy + 1, X.GOAL_CELL)
        sy, sx = start // W, start % W
        agent_pos = jnp.stack([sx + 1, sy + 1]).astype(jnp.int32)
        agent_dir = jax.random.randint(keys[3], (), 0, 4)
        return self.make_state(grid, agent_pos, agent_dir, rng=keys[4])

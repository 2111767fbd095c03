"""WFC subsystem tests: catalog parity vs the reference extraction code,
solver consistency, and env-level structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import add_reference_to_path
from tests.test_generation import reachable

add_reference_to_path()

import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.envs.wfc import patterns as P
from minigrid_tpu.envs.wfc import solver as S
from minigrid_tpu.envs.wfc.config import WFC_PRESETS
from minigrid_tpu.envs.wfc.pattern_data import PATTERNS


@pytest.mark.parametrize("preset", ["MazeSimple", "DungeonMazeScaled",
                                    "ObstaclesBlackdots"])
def test_catalog_matches_reference(preset):
    """Pattern count, weights and adjacency sizes equal the reference
    pipeline's on the same source image."""
    from imageio.v2 import imread

    from minigrid.envs.wfc.wfclogic.adjacency import adjacency_extraction
    from minigrid.envs.wfc.wfclogic.patterns import (
        make_pattern_catalog_with_rotations,
    )
    from minigrid.envs.wfc.wfclogic.tiles import make_tile_catalog

    cfg = WFC_PRESETS[preset]
    img_path = f"/root/reference/minigrid/envs/wfc/patterns/{cfg.pattern}.png"
    img = imread(img_path)[:, :, :3]
    _, tile_grid, _, _ = make_tile_catalog(img, 1)
    pcat, pfreq, _, pcodes = make_pattern_catalog_with_rotations(
        tile_grid, cfg.pattern_width, rotations=7,
        input_is_periodic=cfg.input_periodic)
    ref_legal = adjacency_extraction(
        pcodes, pcat, list(enumerate([(0, -1), (1, 0), (0, 1), (-1, 0)])),
        (cfg.pattern_width, cfg.pattern_width))

    pats, weights, _ = P.build_catalog(
        PATTERNS[cfg.pattern], cfg.pattern_width, cfg.rotations,
        cfg.input_periodic)
    adj = P.build_adjacency(pats)

    assert len(pats) == len(pcat)
    assert sorted(weights) == sorted(pfreq.values())
    assert adj.sum() == len(ref_legal)


def test_solver_output_is_pattern_consistent():
    """Every adjacent pattern pair in a solved grid satisfies the overlap
    constraints, and the tile layout windows match source patterns."""
    pats, w, tiles = P.build_catalog(PATTERNS["SimpleMaze"], 2, 8, False)
    adj = P.build_adjacency(pats)
    grid, ok = jax.jit(lambda k: S.solve(
        k, jnp.asarray(adj), jnp.asarray(w), (17, 17), False))(
        jax.random.PRNGKey(1))
    assert bool(ok)
    g = np.asarray(grid)
    assert (pats[g[:, :-1]][:, :, 0, 1] == pats[g[:, 1:]][:, :, 0, 0]).all()
    assert (pats[g[:-1, :]][:, :, 1, 0] == pats[g[1:, :]][:, :, 0, 0]).all()


@pytest.mark.parametrize("env_id", ["MiniGrid-WFC-MazeSimple-v0",
                                    "MiniGrid-WFC-ObstaclesBlackdots-v0"])
def test_wfc_env_structure(env_id):
    env = minigrid_tpu.make(env_id, size=15)
    obs, states = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 8))
    grids = np.asarray(states.grid)
    for b in range(8):
        t = grids[b][..., 0]
        # boundary ring of walls
        assert (t[0, :] == C.WALL).all() and (t[-1, :] == C.WALL).all()
        assert (t[:, 0] == C.WALL).all() and (t[:, -1] == C.WALL).all()
        assert (t == C.GOAL).sum() == 1
        # goal reachable from the agent (largest-component guarantee)
        assert reachable(grids[b], np.asarray(states.agent_pos[b]),
                         t == C.GOAL), f"{env_id} seed#{b}"
    assert env.mission_text(jax.tree.map(lambda x: x[0], states)) == \
        "traverse the maze to get to the goal"

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


def _fixture_problem(out=(12, 12)):
    pats, w, _ = P.build_catalog(PATTERNS["SimpleMaze"], 2, 8, False)
    adj = P.build_adjacency(pats)
    return jnp.asarray(adj), jnp.asarray(w), out


@pytest.mark.parametrize("loc", [
    loc if loc in ("entropy", "spiral")
    else pytest.param(loc, marks=pytest.mark.nightly)
    for loc in S.LOC_HEURISTICS
])
def test_solver_location_heuristics(loc):
    """Every location heuristic solves the fixture (anti-entropy is
    contradiction-prone by design, hence retries) and actually changes the
    collapse order (different outputs under the same key)."""
    adj, w, out = _fixture_problem()
    grid, ok = S.solve_with_retries(
        jax.random.PRNGKey(3), adj, w, out, False, 32, loc_heuristic=loc)
    assert bool(ok), loc
    if loc != "entropy":
        base, ok0 = S.solve_with_retries(
            jax.random.PRNGKey(3), adj, w, out, False, 32,
            loc_heuristic="entropy")
        assert bool(ok0)
        assert not np.array_equal(np.asarray(grid), np.asarray(base)), (
            f"loc_heuristic={loc} produced the entropy ordering exactly")


@pytest.mark.parametrize("choice", list(S.CHOICE_HEURISTICS))
def test_solver_choice_heuristics(choice):
    if choice in ("rarest", "most common"):
        # 'rarest'/'most common' draw among extreme-support patterns
        # without restricting to the collapsed cell (reference
        # solver.py:340-385) — on constrained catalogs they contradict by
        # design, and the reference neither tests them nor ships a preset
        # using them. Prove the mechanism on an unconstrained catalog where
        # every pattern pairing is legal.
        P_, out = 3, (6, 6)
        adj = jnp.ones((4, P_, P_), bool)
        w = jnp.ones((P_,), jnp.float32)
    else:
        adj, w, out = _fixture_problem()
    grid, ok = S.solve_with_retries(
        jax.random.PRNGKey(5), adj, w, out, False, 16,
        choice_heuristic=choice)
    assert bool(ok), choice


def test_solver_backtracking_and_allpatterns():
    adj, w, out = _fixture_problem()
    grid, ok = jax.jit(lambda k: S.solve(
        k, adj, w, out, False, backtracking=True))(jax.random.PRNGKey(7))
    assert bool(ok)
    # allpatterns: solvable fixture keeps every pattern present somewhere
    # on a large enough grid or reports contradiction - must not hang
    grid2, ok2 = S.solve_with_retries(
        jax.random.PRNGKey(8), adj, w, (20, 20), False, 16,
        global_constraint="allpatterns")
    assert bool(ok2)
    used = np.unique(np.asarray(grid2))
    assert len(used) == adj.shape[1], "allpatterns must force full coverage"


@pytest.mark.nightly
def test_all_presets_solve():
    """Every embedded preset catalog builds and solves a small output grid
    (the reference registers 6 presets but ships 22,
    config.py:173-505)."""
    from minigrid_tpu.envs.wfc.config import WFC_PRESETS_ALL

    failed = []
    for name, cfg in WFC_PRESETS_ALL.items():
        pats, w, _ = P.build_catalog(
            PATTERNS[cfg.pattern], cfg.pattern_width, cfg.rotations,
            cfg.input_periodic)
        adj = P.build_adjacency(pats)
        grid, ok = S.solve_with_retries(
            jax.random.PRNGKey(11), jnp.asarray(adj), jnp.asarray(w),
            (10, 10), cfg.output_periodic, 32,
            loc_heuristic=cfg.loc_heuristic,
            choice_heuristic=cfg.choice_heuristic,
            backtracking=cfg.backtracking,
            global_constraint=cfg.global_constraint)
        if not bool(ok):
            failed.append(name)
    # the reference ships inconsistent/slow presets precisely because they
    # are hard to satisfy; require the 6 registered defaults to always
    # solve and the rest to mostly solve
    from minigrid_tpu.envs.wfc.config import WFC_PRESETS

    assert not (set(failed) & set(WFC_PRESETS)), failed
    assert len(failed) <= 4, failed


def test_solve_with_stats(tmp_path):
    """The instrumented retry loop records per-attempt stats and the TSV
    log (reference control.py:262-284 / make_log_stats :45-61)."""
    adj, w, out = _fixture_problem((8, 8))
    log = tmp_path / "wfc_stats.tsv"
    grid, ok, stats = S.solve_with_stats(
        jax.random.PRNGKey(2), adj, w, out, False, 16, log_path=str(log))
    assert bool(ok)
    assert stats[-1]["success"] and all(s["time"] > 0 for s in stats)
    lines = log.read_text().strip().split("\n")
    assert lines[0] == "attempt\ttime\tsuccess" and len(lines) == len(stats) + 1


def test_solver_rejects_unknown_options():
    adj, w, out = _fixture_problem()
    with pytest.raises(ValueError):
        S.solve(jax.random.PRNGKey(0), adj, w, out, False,
                loc_heuristic="hilbert")
    with pytest.raises(ValueError):
        S.solve(jax.random.PRNGKey(0), adj, w, out, False,
                choice_heuristic="least-common")
    with pytest.raises(ValueError):
        S.solve(jax.random.PRNGKey(0), adj, w, out, False,
                global_constraint="nope")


def test_graph_transforms_roundtrip():
    """layout -> dense graph -> layout is exact, and edge layers carry the
    reference EDGE_CONFIG semantics (graphtransforms.py:96-388)."""
    from minigrid_tpu.envs.wfc import graphtransforms as GT

    env = minigrid_tpu.make("MiniGrid-WFC-MazeSimple-v0", size=13)
    _, st = jax.jit(env.reset)(jax.random.PRNGKey(0))
    layout = np.asarray(st.grid[..., 0]).copy()
    ax, ay = np.asarray(st.agent_pos)
    layout[ax, ay] = C.AGENT  # stamp the start node like the reference

    feats, edges = GT.minigrid_layout_to_dense_graph(
        layout[None], edge_config=GT.EDGE_CONFIG)
    W = H = 13
    N = (W - 2) * (H - 2)
    for attr in GT.FEATURE_DESCRIPTORS:
        assert feats[attr].shape == (1, N)
    # navigable = empty | start | goal, exclusive with non_navigable
    nav = feats["navigable"][0]
    assert np.allclose(
        nav, (feats["empty"][0] + feats["start"][0] + feats["goal"][0]) > 0)
    assert not np.any((nav > 0) & (feats["non_navigable"][0] > 0))

    # grid-structure layer: symmetric, only lattice-adjacent navigable pairs
    adj = np.asarray(edges["navigable"][0])
    assert (adj == adj.T).all()
    base = np.asarray(GT.grid_adjacency((W - 2, H - 2)))
    assert not np.any(adj & ~base)
    idx = np.nonzero(adj.any(0))[0]
    assert np.all(nav[idx] > 0)
    # product-structure layer: exactly start x goal (1 pair, symmetric)
    sg = np.asarray(edges["start_goal"][0])
    assert sg.sum() == 2 and (sg == sg.T).all()

    rebuilt = np.asarray(GT.dense_graph_to_minigrid(feats, shape=(W, H)))
    assert rebuilt.shape == (1, W, H, 3)
    assert (rebuilt[0, ..., 0] == layout).all()
    # color conventions of the reference MINIGRID_COLOR_CONFIG
    assert (rebuilt[0][layout == C.GOAL][:, 1]
            == C.COLOR_TO_IDX["green"]).all()
    assert (rebuilt[0][layout == C.WALL][:, 1]
            == C.COLOR_TO_IDX["grey"]).all()

    bitmap, start, goal = GT.minigrid_to_bitmap(rebuilt)
    assert bitmap.shape == (1, W - 2, H - 2)
    assert tuple(np.asarray(start[0])) == (ax, ay)
    assert layout[tuple(np.asarray(goal[0]))] == C.GOAL


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

"""Statistical validity of our jittable procedural generation.

Parity tests pin dynamics on reference-made layouts; these tests check the
layouts our own ``reset`` produces: structural invariants and solvability
(BFS reachability), batched over many seeds — the array-era analog of the
reference's seed-reproducibility and solvability suites
(tests/test_envs.py:198-253, tests/test_obstructed_maze.py).
"""

import jax
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.core import constants as C

N_SEEDS = 64


def batch_reset(env_id, n=N_SEEDS, **kw):
    env = minigrid_tpu.make(env_id, **kw)
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    obs, states = jax.jit(jax.vmap(env.reset))(keys)
    return env, jax.tree.map(np.asarray, obs), jax.tree.map(np.asarray, states)


def passable(grid_row):
    """Cells the agent can traverse safely (empty/floor/goal/open door)."""
    t, s = grid_row[..., 0], grid_row[..., 2]
    return (
        (t == C.EMPTY) | (t == C.FLOOR) | (t == C.GOAL)
        | ((t == C.DOOR) & (s == C.OPEN))
    )


def reachable(grid, start, targets_mask, extra_passable=None):
    """BFS from start over passable cells; True if any target reached."""
    ok = passable(grid)
    if extra_passable is not None:
        ok = ok | extra_passable
    W, H = ok.shape
    seen = np.zeros_like(ok)
    stack = [tuple(start)]
    seen[start[0], start[1]] = True
    while stack:
        x, y = stack.pop()
        if targets_mask[x, y]:
            return True
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nx, ny = x + dx, y + dy
            if 0 <= nx < W and 0 <= ny < H and not seen[nx, ny] and (
                ok[nx, ny] or targets_mask[nx, ny]
            ):
                seen[nx, ny] = True
                stack.append((nx, ny))
    return False


def goal_mask(grid):
    return grid[..., 0] == C.GOAL


@pytest.mark.parametrize("env_id", [
    "MiniGrid-Empty-Random-5x5-v0",
    "MiniGrid-FourRooms-v0",
    "MiniGrid-LavaGapS5-v0",
    "MiniGrid-LavaGapS7-v0",
    "MiniGrid-LavaCrossingS9N3-v0",
    "MiniGrid-LavaCrossingS11N5-v0",
    "MiniGrid-SimpleCrossingS11N5-v0",
    "MiniGrid-DistShift1-v0",
])
def test_goal_reachable(env_id):
    _, _, states = batch_reset(env_id)
    for b in range(N_SEEDS):
        grid = states.grid[b]
        assert reachable(grid, states.agent_pos[b], goal_mask(grid)), (
            f"{env_id} seed#{b}: goal unreachable"
        )


def test_doorkey_structure():
    _, _, states = batch_reset("MiniGrid-DoorKey-8x8-v0")
    for b in range(N_SEEDS):
        grid = states.grid[b]
        types = grid[..., 0]
        assert (types == C.DOOR).sum() == 1
        assert (types == C.KEY).sum() == 1
        assert (types == C.GOAL).sum() == 1
        door = np.argwhere(types == C.DOOR)[0]
        key = np.argwhere(types == C.KEY)[0]
        agent = states.agent_pos[b]
        # agent and key on the left of the splitting wall, goal right
        assert agent[0] < door[0] and key[0] < door[0]
        # key reachable from agent without crossing the door
        assert reachable(grid, agent, types == C.KEY)
        # goal reachable treating the locked door and the (picked-up) key
        # as passable
        openable = (types == C.KEY)
        openable[door[0], door[1]] = True
        assert reachable(grid, agent, goal_mask(grid), extra_passable=openable)


def test_memory_structure():
    _, _, states = batch_reset("MiniGrid-MemoryS13-v0")
    for b in range(N_SEEDS):
        grid = states.grid[b]
        types = grid[..., 0]
        n_keys = (types == C.KEY).sum()
        n_balls = (types == C.BALL).sum()
        assert n_keys + n_balls == 3 and 1 <= n_keys <= 2
        sp = states.extra["success_pos"][b]
        mask = np.zeros_like(types, bool)
        mask[sp[0], sp[1]] = True
        assert reachable(grid, states.agent_pos[b], mask)


def test_dynamic_obstacles_movement_and_collision():
    env, _, states = batch_reset("MiniGrid-Dynamic-Obstacles-8x8-v0", n=32)
    state0 = jax.tree.map(lambda x: x[0], states)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    prev = state0
    for t in range(20):
        key, sub = jax.random.split(key)
        _, new, reward, term, trunc, _ = step(sub, prev, 6)  # done = no-op move
        old_obs = np.asarray(prev.extra["obstacles"])
        new_obs = np.asarray(new.extra["obstacles"])
        assert (np.abs(new_obs - old_obs) <= 1).all(), "obstacle jumped"
        assert (np.asarray(new.grid)[..., 0] == C.BALL).sum() == env.n_obstacles
        prev = new

    # collision: place agent facing a ball
    grid = np.asarray(state0.grid)
    balls = np.argwhere(grid[..., 0] == C.BALL)
    bx, by = balls[0]
    # stand left of the ball, facing right; if that cell is blocked, skip
    if grid[bx - 1, by, 0] == C.EMPTY:
        s = state0.replace(
            agent_pos=jax.numpy.asarray([bx - 1, by]),
            agent_dir=jax.numpy.asarray(0),
        )
        _, _, reward, term, _, _ = step(jax.random.PRNGKey(2), s, 2)
        assert bool(term) and float(reward) == -1.0


def test_fetch_mission_realizes():
    env, obs, states = batch_reset("MiniGrid-Fetch-8x8-N3-v0", n=16)
    for b in range(16):
        text = env.mission_text(states.mission[b])
        assert any(
            text.startswith(s) for s in
            ["get a", "go get a", "fetch a", "go fetch a", "you must fetch a"]
        ), text
        # the named object exists in the grid
        color, tname = text.split()[-2], text.split()[-1]
        t_id = C.OBJECT_TO_IDX[tname]
        c_id = C.COLOR_TO_IDX[color]
        grid = states.grid[b]
        assert ((grid[..., 0] == t_id) & (grid[..., 1] == c_id)).any()


def test_gotodoor_doors_distinct():
    env, _, states = batch_reset("MiniGrid-GoToDoor-8x8-v0", n=32)
    for b in range(32):
        grid = states.grid[b]
        doors = grid[grid[..., 0] == C.DOOR]
        assert len(doors) == 4
        assert len(set(doors[:, 1])) == 4, "door colors not distinct"


def test_putnear_objects_apart():
    _, _, states = batch_reset("MiniGrid-PutNear-8x8-N3-v0", n=32)
    for b in range(32):
        grid = states.grid[b]
        types = grid[..., 0]
        objs = np.argwhere(
            (types == C.KEY) | (types == C.BALL) | (types == C.BOX)
        )
        assert len(objs) == 3
        for i in range(3):
            for j in range(i + 1, 3):
                assert np.abs(objs[i] - objs[j]).max() > 1, "objects adjacent"


def test_keycorridor_structure():
    _, _, states = batch_reset("MiniGrid-KeyCorridorS6R3-v0", n=32)
    for b in range(32):
        grid = states.grid[b]
        types, colors, dstates = grid[..., 0], grid[..., 1], grid[..., 2]
        locked = np.argwhere((types == C.DOOR) & (dstates == 2))
        assert len(locked) == 1, "exactly one locked door"
        lx, ly = locked[0]
        keys = np.argwhere((types == C.KEY) & (colors == colors[lx, ly]))
        assert len(keys) >= 1, "key matching the locked door"
        # target ball behind the locked door is reachable once opened
        target = (types == C.BALL) & (
            colors == int(states.extra["target_color"][b]))
        doors_open = types == C.DOOR
        assert reachable(grid, states.agent_pos[b], target,
                         extra_passable=doors_open | (types == C.KEY))


def test_unlock_structure():
    for env_id in ["MiniGrid-Unlock-v0", "MiniGrid-UnlockPickup-v0",
                   "MiniGrid-BlockedUnlockPickup-v0"]:
        _, _, states = batch_reset(env_id, n=32)
        for b in range(32):
            grid = states.grid[b]
            types, colors, dstates = grid[..., 0], grid[..., 1], grid[..., 2]
            locked = np.argwhere((types == C.DOOR) & (dstates == 2))
            assert len(locked) == 1, env_id
            lx, ly = locked[0]
            assert ((types == C.KEY) & (colors == colors[lx, ly])).any(), env_id


def test_obstructed_v1_never_covers_keys():
    """v1 invariant: blockers can never erase a key box
    (reference obstructedmaze_v1.py; tests/test_obstructed_maze.py)."""
    for env_id, quarters in [("MiniGrid-ObstructedMaze-2Dlhb-v1", 1),
                             ("MiniGrid-ObstructedMaze-Full-v1", 4)]:
        _, _, states = batch_reset(env_id, n=256)
        grids = states.grid
        types, colors = grids[..., 0], grids[..., 1]
        n_boxes = ((types == C.BOX)).sum(axis=(1, 2))
        n_blockers = ((types == C.BALL)
                      & (colors == C.COLOR_TO_IDX["green"])).sum(axis=(1, 2))
        n_targets = ((types == C.BALL)
                     & (colors == C.COLOR_TO_IDX["blue"])).sum(axis=(1, 2))
        assert (n_boxes == 2 * quarters).all(), env_id
        assert (n_blockers == 2 * quarters).all(), env_id
        assert (n_targets == 1).all(), env_id
        # every box still contains its key
        has_key = grids[..., 3] == C.KEY
        assert ((types == C.BOX) <= has_key).all(), env_id


def test_multiroom_goal_reachable():
    for env_id in ["MiniGrid-MultiRoom-N2-S4-v0", "MiniGrid-MultiRoom-N6-v0"]:
        _, _, states = batch_reset(env_id, n=32)
        for b in range(32):
            grid = states.grid[b]
            doors = grid[..., 0] == C.DOOR
            assert reachable(grid, states.agent_pos[b], goal_mask(grid),
                             extra_passable=doors), f"{env_id} seed#{b}"
            if env_id == "MiniGrid-MultiRoom-N6-v0":
                assert doors.sum() == 5, "6 rooms need 5 connecting doors"


def test_lockedroom_structure():
    _, _, states = batch_reset("MiniGrid-LockedRoom-v0", n=32)
    for b in range(32):
        grid = states.grid[b]
        types, colors, dstates = grid[..., 0], grid[..., 1], grid[..., 2]
        locked = np.argwhere((types == C.DOOR) & (dstates == 2))
        assert len(locked) == 1
        assert (types == C.DOOR).sum() == 6
        doors = grid[types == C.DOOR]
        assert len(set(doors[:, 1])) == 6, "distinct door colors"
        lx, ly = locked[0]
        assert ((types == C.KEY) & (colors == colors[lx, ly])).any()
        # goal inside the locked room: reachable only through doors
        assert reachable(grid, states.agent_pos[b], goal_mask(grid),
                         extra_passable=(types == C.DOOR) | (types == C.KEY))


def test_env_docs_carry_all_sections():
    """Every MiniGrid/WFC env family class documents the six reference
    sections (description/mission/actions/observation/rewards/termination
    — the per-env doc contract of the reference env files, e.g.
    /root/reference/minigrid/envs/doorkey.py:10-61), and the documented
    mission matches the env's realized default where one exists."""
    from minigrid_tpu import registry

    classes = {}
    for env_id in minigrid_tpu.registered_ids():
        cls = type(registry.make(env_id))
        mro = [c for c in cls.__mro__ if c.__module__.startswith(
            "minigrid_tpu.envs")]
        classes[mro[-1 if len(mro) == 1 else 0]] = env_id

    required = ["## Description", "## Mission Space", "## Action Space",
                "## Observation Encoding", "## Rewards", "## Termination"]
    missing = []
    for cls in set(classes):
        base_doc = None
        for c in cls.__mro__:
            if c.__doc__ and "## Description" in c.__doc__:
                base_doc = c.__doc__
                break
        if base_doc is None:
            missing.append((cls.__name__, "no structured docstring"))
            continue
        for section in required:
            if section not in base_doc:
                missing.append((cls.__name__, section))
    assert not missing, missing

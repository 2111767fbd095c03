"""MultiRoom environment (reference minigrid/envs/multiroom.py:95-284).

The reference builds a chain of connected rooms with recursive backtracking
(8 exit-door retries per level, restart on failure, keep the longest chain).
Under jit this becomes a bounded iterative builder: each attempt grows the
chain room-by-room with up to 8 vectorized placement proposals per room
(bounds + pairwise-overlap checks over fixed-shape arrays); a bounded outer
while_loop restarts until a full-length chain exists. Room geometry, door
rules, wall/door paint order and color sequencing match the reference; only
the backtracking *search order* differs (distribution-equivalent layouts,
validated statistically in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import place
from minigrid_tpu.core.types import EnvParams, pack_cell
from minigrid_tpu.envs import common as X
from minigrid_tpu.envs.base import MiniGridEnv
from minigrid_tpu.envs.envdoc import env_doc


class MultiRoomEnv(MiniGridEnv):
    name = "MultiRoom"
    __doc__ = env_doc(
        """
        A chain of connected rooms, each entered through a colored door
        from the previous one; the green goal square waits in the last
        room. Hard for flat RL when the chain is long, but the room count
        scales, making it a natural curriculum axis. Constructor knobs:
        ``minNumRooms``/``maxNumRooms`` (rooms per episode),
        ``maxRoomSize`` (default 10), ``width``/``height`` of the map
        (default 25), and ``max_steps`` (default ``maxNumRooms * 20``).
        Reference: minigrid/envs/multiroom.py.
        """,
        '"traverse the rooms to get to the goal"',
        used=(0, 1, 2, 5),
        termination=("The agent reaches the goal.",
                     "Timeout (see `max_steps`)."),
        configurations="""
        - ``MiniGrid-MultiRoom-N2-S4-v0`` — two small rooms
        - ``MiniGrid-MultiRoom-N4-S5-v0`` — legacy id (misconfigured for
          six rooms, kept for compatibility)
        - ``MiniGrid-MultiRoom-N4-S5-v1`` — fixed four-room config
        - ``MiniGrid-MultiRoom-N6-v0`` — six rooms
        """,
    )

    def __init__(self, minNumRooms, maxNumRooms, maxRoomSize=10,
                 width=25, height=25, max_steps=None, **kw):
        assert maxRoomSize >= 4
        if max_steps is None:
            max_steps = maxNumRooms * 20
        super().__init__(EnvParams(width=width, height=height,
                                   max_steps=max_steps, **kw))
        self.min_rooms = minNumRooms
        self.max_rooms = maxNumRooms
        self.max_room_size = maxRoomSize

    def default_mission(self) -> str:
        return "traverse the rooms to get to the goal"

    def _propose_next(self, key, t, tops, sizes, entry_walls, entry_pos, count):
        """One placement proposal for room ``t`` given the chain so far.
        Returns (ok, top, size, exit_pos, next_entry_wall)."""
        p = self.params
        k_wall, k_exit, k_sx, k_sy, k_top = jax.random.split(key, 5)
        prev_top, prev_size = tops[t - 1], sizes[t - 1]
        prev_entry_wall = entry_walls[t - 1]

        # exit wall: uniform over the 3 walls != entry wall
        # (multiroom.py:240-244 over sorted({0,1,2,3} - {entry}))
        r = jax.random.randint(k_wall, (), 0, 3)
        exit_wall = r + (r >= prev_entry_wall)
        next_entry_wall = (exit_wall + 2) % 4

        # exit door position on that wall (multiroom.py:246-259)
        along_x = jax.random.randint(k_exit, (), 1, jnp.maximum(prev_size[0] - 1, 2))
        along_y = jax.random.randint(k_exit, (), 1, jnp.maximum(prev_size[1] - 1, 2))
        exit_pos = jnp.select(
            [exit_wall == 0, exit_wall == 1, exit_wall == 2, exit_wall == 3],
            [
                jnp.stack([prev_top[0] + prev_size[0] - 1, prev_top[1] + along_y]),
                jnp.stack([prev_top[0] + along_x, prev_top[1] + prev_size[1] - 1]),
                jnp.stack([prev_top[0], prev_top[1] + along_y]),
                jnp.stack([prev_top[0] + along_x, prev_top[1]]),
            ],
        )

        # room size and top placement (multiroom.py:196-228)
        sx = jax.random.randint(k_sx, (), 4, self.max_room_size + 1)
        sy = jax.random.randint(k_sy, (), 4, self.max_room_size + 1)
        ex, ey = exit_pos[0], exit_pos[1]
        rx = jax.random.randint(k_top, (), ey - sy + 2, ey)      # entry on l/r
        ry = jax.random.randint(jax.random.fold_in(k_top, 1), (),
                                ex - sx + 2, ex)                  # entry on u/d
        top = jnp.select(
            [next_entry_wall == 0, next_entry_wall == 1,
             next_entry_wall == 2, next_entry_wall == 3],
            [
                jnp.stack([ex - sx + 1, rx]),
                jnp.stack([ry, ey - sy + 1]),
                jnp.stack([ex, rx]),
                jnp.stack([ry, ey]),
            ],
        )
        size = jnp.stack([sx, sy])

        ok = (top >= 0).all()
        ok &= top[0] + sx <= p.width
        ok &= top[1] + sy < p.height
        # overlap vs all rooms except the immediate predecessor
        # (multiroom.py:231-241): nonOverlap uses < on the low side and <=
        # on the high side
        idx = jnp.arange(tops.shape[0])
        others = (idx < count) & (idx != count - 1)
        non_overlap = (
            (top[0] + sx < tops[:, 0])
            | (tops[:, 0] + sizes[:, 0] <= top[0])
            | (top[1] + sy < tops[:, 1])
            | (tops[:, 1] + sizes[:, 1] <= top[1])
        )
        ok &= jnp.where(others, non_overlap, True).all()
        return ok, top, size, exit_pos, next_entry_wall

    def _build_chain(self, key, num_rooms):
        """One full chain attempt. Returns (tops, sizes, entries, length)."""
        p = self.params
        N = self.max_rooms
        k0, k_loop = jax.random.split(key)
        k_e, k_sx, k_sy = jax.random.split(k0, 3)

        tops = jnp.zeros((N, 2), jnp.int32)
        sizes = jnp.zeros((N, 2), jnp.int32)
        entry_walls = jnp.zeros((N,), jnp.int32)
        entry_pos = jnp.zeros((N, 2), jnp.int32)

        # room 0 (multiroom.py:127,197-199): top at a random entry position,
        # entry wall 2 (left)
        e0 = jnp.stack([
            jax.random.randint(k_e, (), 0, p.width - 2),
            jax.random.randint(jax.random.fold_in(k_e, 1), (), 0, p.width - 2),
        ])
        s0 = jnp.stack([
            jax.random.randint(k_sx, (), 4, self.max_room_size + 1),
            jax.random.randint(k_sy, (), 4, self.max_room_size + 1),
        ])
        ok0 = (e0[0] + s0[0] <= p.width) & (e0[1] + s0[1] < p.height)
        tops = tops.at[0].set(e0)
        sizes = sizes.at[0].set(s0)
        entry_walls = entry_walls.at[0].set(2)
        entry_pos = entry_pos.at[0].set(e0)
        count = jnp.where(ok0, 1, 0)

        def grow(t, carry):
            tops, sizes, entry_walls, entry_pos, count = carry
            key_t = jax.random.fold_in(k_loop, t)

            def try_proposals(s, best):
                ok, top, size, exit_pos, wall = self._propose_next(
                    jax.random.fold_in(key_t, s), t, tops, sizes,
                    entry_walls, entry_pos, count,
                )
                take = ok & ~best[0]
                return (
                    best[0] | ok,
                    jnp.where(take, top, best[1]),
                    jnp.where(take, size, best[2]),
                    jnp.where(take, exit_pos, best[3]),
                    jnp.where(take, wall, best[4]),
                )

            init = (jnp.zeros((), bool), jnp.zeros(2, jnp.int32),
                    jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
                    jnp.zeros((), jnp.int32))
            found, top, size, exit_pos, wall = jax.lax.fori_loop(
                0, 8, try_proposals, init)

            grow_ok = found & (count == t) & (t < num_rooms)
            tops = tops.at[t].set(jnp.where(grow_ok, top, tops[t]))
            sizes = sizes.at[t].set(jnp.where(grow_ok, size, sizes[t]))
            entry_walls = entry_walls.at[t].set(
                jnp.where(grow_ok, wall, entry_walls[t]))
            entry_pos = entry_pos.at[t].set(
                jnp.where(grow_ok, exit_pos, entry_pos[t]))
            count = jnp.where(grow_ok, count + 1, count)
            return tops, sizes, entry_walls, entry_pos, count

        tops, sizes, entry_walls, entry_pos, count = jax.lax.fori_loop(
            1, N, grow, (tops, sizes, entry_walls, entry_pos, count))
        return tops, sizes, entry_pos, count

    def _gen_grid(self, key):
        p = self.params
        N = self.max_rooms
        k_n, k_chain, k_colors, k_agent, k_goal, k_rng = jax.random.split(key, 6)
        num_rooms = jax.random.randint(k_n, (), self.min_rooms, self.max_rooms + 1)

        # retry chain attempts until one reaches num_rooms, keeping the best
        # (multiroom.py:120-139); bounded for jit
        def cond(carry):
            best_count, _, _, _, attempt = carry
            return (best_count < num_rooms) & (attempt < 256)

        def body(carry):
            best_count, b_tops, b_sizes, b_entry, attempt = carry
            tops, sizes, entry_pos, count = self._build_chain(
                jax.random.fold_in(k_chain, attempt), num_rooms)
            better = count > best_count
            return (
                jnp.where(better, count, best_count),
                jnp.where(better, tops, b_tops),
                jnp.where(better, sizes, b_sizes),
                jnp.where(better, entry_pos, b_entry),
                attempt + 1,
            )

        zero = (jnp.zeros((), jnp.int32), jnp.zeros((N, 2), jnp.int32),
                jnp.zeros((N, 2), jnp.int32), jnp.zeros((N, 2), jnp.int32),
                jnp.zeros((), jnp.int32))
        count, tops, sizes, entry_pos, _ = jax.lax.while_loop(cond, body, zero)

        # paint rooms in order: walls then entry door (multiroom.py:148-189)
        grid = G.empty_grid(p.width, p.height)
        prev_color = jnp.asarray(-1, jnp.int32)
        for t in range(N):
            active = t < count
            painted = grid
            painted = G.fill_rect(painted, tops[t, 0], tops[t, 1],
                                  sizes[t, 0], 1, X.WALL_CELL)
            painted = G.fill_rect(painted, tops[t, 0],
                                  tops[t, 1] + sizes[t, 1] - 1,
                                  sizes[t, 0], 1, X.WALL_CELL)
            painted = G.fill_rect(painted, tops[t, 0], tops[t, 1],
                                  1, sizes[t, 1], X.WALL_CELL)
            painted = G.fill_rect(painted, tops[t, 0] + sizes[t, 0] - 1,
                                  tops[t, 1], 1, sizes[t, 1], X.WALL_CELL)
            if t > 0:
                # door color != previous door's color (multiroom.py:165-174)
                kc = jax.random.fold_in(k_colors, t)
                first = prev_color < 0
                j6 = jax.random.randint(kc, (), 0, 6)
                j5 = jax.random.randint(kc, (), 0, 5)
                j5 = j5 + (j5 >= prev_color)
                color_idx = jnp.where(first, j6, j5)
                door = pack_cell(C.DOOR, X.SORTED_COLOR_IDS[color_idx], C.CLOSED)
                painted = G.set_cell(painted, entry_pos[t, 0], entry_pos[t, 1],
                                     door)
                prev_color = jnp.where(active, color_idx, prev_color)
            grid = jnp.where(active, painted, grid)

        # agent in room 0, goal in the last room (multiroom.py:181-186)
        rect0 = place.rect_mask(p.width, p.height, tops[0], sizes[0])
        agent_pos = place.sample_from_mask(k_agent, G.free_mask(grid) & rect0)
        agent_dir = jax.random.randint(jax.random.fold_in(k_agent, 1), (), 0, 4)

        last = count - 1
        rect_l = place.rect_mask(p.width, p.height, tops[last], sizes[last])
        goal_mask = G.free_mask(grid) & rect_l
        goal_mask &= ~((G.coord_grids(p.width, p.height)[0] == agent_pos[0])
                       & (G.coord_grids(p.width, p.height)[1] == agent_pos[1]))
        goal_pos = place.sample_from_mask(k_goal, goal_mask)
        grid = G.set_cell(grid, goal_pos[0], goal_pos[1], X.GOAL_CELL)

        return self.make_state(grid, agent_pos, agent_dir, rng=k_rng)

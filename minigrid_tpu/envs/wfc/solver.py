"""Jittable Wave Function Collapse solver.

Re-design of the reference solver (``minigrid/envs/wfc/wfclogic/solver.py``):
the wave is a (P, H, W) boolean array; constraint propagation is the same
pad/shift + boolean-matmul fixpoint (solver.py:422-484) under a
``lax.while_loop`` — on TPU the (P, P) @ (P, H*W) products ride the MXU —
and the observe/collapse loop is a second while_loop with per-step key
folding. Contradictions restart the attempt with a fresh key (the retry loop
of wfclogic/control.py:231-295).

The full heuristic menu of the reference is supported, selected statically
at trace time so the compiled step stays branchless:

- location heuristics (solver.py:168-318): ``lexical``, ``entropy``,
  ``anti-entropy``, ``simple``, ``random``, ``spiral`` — each reduces to an
  argmin/argmax over a per-cell score with unresolved-cell masking. The
  reference's random tie-breaking field (control.py:175-177) becomes a
  per-attempt uniform noise draw; the spiral order is precomputed host-side
  (reference spiral_transforms/fill_with_curve, solver.py:213-275).
  ``hilbert`` is rejected like the reference config's Literal does not
  admit it (config.py:37-39).
- pattern heuristics (solver.py:317-405): ``lexical``, ``weighted``,
  ``random``, ``rarest``. ``rarest`` reproduces the reference's semantics
  of drawing uniformly among the patterns maximizing whole-wave support —
  including not restricting to the collapsed cell's possibilities.
- backtracking (solver.py:73-113): on contradiction after a collapse the
  pre-step wave is restored and the tried pattern banned at the chosen
  location. The reference keeps a history stack, but every ``solve_next``
  pushes before the try-block whose handler pops — the pop always returns
  that same call's push, so the stack is effectively a one-level undo and
  deeper entries are unreachable; this implementation keeps just the
  current wave. As in the reference, a contradiction discovered by the
  pre-observe propagation ends the attempt (it is raised outside the
  try, solver.py:87-89).
- global constraint ``allpatterns`` (solver.py:410-419 /
  control.py:209-216): an attempt is infeasible as soon as any pattern has
  no remaining possible location.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

LOC_HEURISTICS = ("lexical", "entropy", "anti-entropy", "simple", "random",
                  "spiral")
CHOICE_HEURISTICS = ("lexical", "weighted", "random", "rarest", "most common")


def propagate(wave, adj, periodic: bool):
    """Fixpoint constraint propagation. wave (P, H, W), adj (4, P, P)."""
    P, H, W = wave.shape

    def shift(w, dy, dx):
        if periodic:
            return jnp.roll(w, shift=(-dy, -dx), axis=(1, 2))
        pad = jnp.pad(w, ((0, 0), (1, 1), (1, 1)), constant_values=True)
        return jax.lax.dynamic_slice(pad, (0, 1 + dy, 1 + dx), (P, H, W))

    def body(carry):
        wave, _ = carry
        new = wave
        for d, (dy, dx) in enumerate([(-1, 0), (1, 0), (0, -1), (0, 1)]):
            shifted = shift(new, dy, dx).reshape(P, -1).astype(jnp.float32)
            support = (adj[d].astype(jnp.float32) @ shifted) > 0
            new = new & support.reshape(P, H, W)
        changed = (new != wave).any()
        return new, changed

    def cond(carry):
        return carry[1]

    wave, _ = jax.lax.while_loop(cond, body, (wave, jnp.ones((), bool)))
    contradiction = (wave.sum(0) == 0).any()
    return wave, contradiction


def spiral_order(shape: tuple[int, int]) -> np.ndarray:
    """(H, W) float in [0, 1): visit order of the reference spiral walk
    from the center (solver.py:213-245 spiral_transforms/spiral_coords +
    fill_with_curve :238-254), computed host-side once per config."""
    H, W = shape
    order = np.zeros((H, W), np.float64)
    x, y = H // 2, W // 2
    fill, total = 0, H * W

    def put(x, y):
        nonlocal fill
        if 0 <= x < H and 0 <= y < W and fill < total:
            order[x, y] = fill / total
            fill += 1

    put(x, y)
    N = 1
    # generous bound: the spiral covers any cell within max(H, W) rings
    while fill < total and N < 2 * max(H, W) + 4:
        if N % 2 == 0:
            moves = [(0, 1)] + [(1, 0)] * N + [(0, -1)] * N
        else:
            moves = [(0, -1)] + [(-1, 0)] * N + [(0, 1)] * N
        for dx, dy in moves:
            x += dx
            y += dy
            put(x, y)
        N += 1
    return order


def _choose_location(wave, loc_heuristic: str, noise, loc_order):
    """Static-heuristic location pick. Returns flat index into (H, W)."""
    P, H, W = wave.shape
    counts = wave.sum(0)
    unresolved = counts > 1
    inf = jnp.inf
    if loc_heuristic == "entropy":
        score = jnp.where(unresolved, noise + counts, inf)
        return jnp.argmin(score.reshape(-1))
    if loc_heuristic == "anti-entropy":
        score = jnp.where(unresolved, noise + counts, -inf)
        return jnp.argmax(score.reshape(-1))
    if loc_heuristic == "simple":
        score = jnp.where(unresolved, counts.astype(jnp.float32), inf)
        return jnp.argmin(score.reshape(-1))
    if loc_heuristic == "random":
        score = jnp.where(unresolved, noise, inf)
        return jnp.argmin(score.reshape(-1))
    if loc_heuristic == "lexical":
        score = jnp.where(unresolved, 1.0, inf)
        return jnp.argmin(score.reshape(-1))
    if loc_heuristic == "spiral":
        score = jnp.where(unresolved, loc_order, inf)
        return jnp.argmin(score.reshape(-1))
    raise ValueError(
        f"unknown loc_heuristic {loc_heuristic!r}; supported: {LOC_HEURISTICS}"
    )


def _choose_pattern(key, cell, wave, weights, choice_heuristic: str):
    """Static-heuristic pattern pick for the collapsed cell."""
    if choice_heuristic == "weighted":
        logits = jnp.where(cell, jnp.log(weights), -jnp.inf)
        return jax.random.categorical(key, logits)
    if choice_heuristic == "random":
        logits = jnp.where(cell, 0.0, -jnp.inf)
        return jax.random.categorical(key, logits)
    if choice_heuristic == "lexical":
        return jnp.argmax(cell)
    if choice_heuristic == "rarest":
        # uniform among the patterns with maximal whole-wave support; like
        # the reference (solver.py:340-361) this is NOT restricted to the
        # cell's own possibilities
        sums = wave.sum(axis=(1, 2))
        logits = jnp.where(sums == sums.max(), 0.0, -jnp.inf)
        return jax.random.categorical(key, logits)
    if choice_heuristic == "most common":
        # uniform among the patterns with MINIMAL whole-wave support
        # (reference solver.py:364-385 draws from wave_sums.min() — the
        # mirror image of its rarest heuristic), again whole-wave, not
        # restricted to the collapsed cell
        sums = wave.sum(axis=(1, 2))
        logits = jnp.where(sums == sums.min(), 0.0, -jnp.inf)
        return jax.random.categorical(key, logits)
    raise ValueError(
        f"unknown choice_heuristic {choice_heuristic!r}; "
        f"supported: {CHOICE_HEURISTICS}"
    )


def solve(key, adj, weights, out_shape, periodic: bool,
          loc_heuristic: str = "entropy", choice_heuristic: str = "weighted",
          backtracking: bool = False, global_constraint: str | None = None,
          noise_scale=0.1):
    """One WFC attempt. Returns (pattern index grid (H, W), ok).

    Heuristic/backtracking options are static: each combination traces to
    its own branchless compiled loop.
    """
    if global_constraint not in (None, "allpatterns"):
        raise ValueError(f"unknown global_constraint {global_constraint!r}")
    H, W = out_shape
    P = weights.shape[0]
    key, k_noise = jax.random.split(key)
    # per-attempt tie-break noise (the reference draws one random weighting
    # field per run, control.py:175-177)
    noise = jax.random.uniform(k_noise, (H, W)) * noise_scale
    loc_order = (
        jnp.asarray(spiral_order(out_shape), jnp.float32)
        if loc_heuristic == "spiral" else None
    )

    RUN, SOLVED, CONTRA = 0, 1, 2
    # a backtracking run can revisit cells after undos; bound generously
    max_iters = (4 if backtracking else 1) * (H * W + 1)

    wave0 = jnp.ones((P, H, W), bool)

    def body(carry):
        wave, status, it, key = carry
        key, k_pat = jax.random.split(key)

        # --- solved? (reference Solver.is_solved, solver.py:65-71) ------
        solved = (wave.sum(0) == 1).all()

        # --- global feasibility (checked before each step, :82-83) ------
        if global_constraint == "allpatterns":
            feasible = wave.any(axis=(1, 2)).all()
        else:
            feasible = jnp.ones((), bool)

        if backtracking:
            # pre-observe propagate: after an undo+ban the wave is no
            # longer a fixpoint; its contradiction is fatal even when
            # backtracking (raised outside the try in solve_next, :87-89)
            wave_p, contra_top = propagate(wave, adj, periodic)
        else:
            # without backtracking the carried wave is always the fixpoint
            # output of the previous iteration's post-collapse propagate
            # (or of the pre-loop propagate), so the reference's
            # pre-observe sweep would discover nothing
            wave_p, contra_top = wave, jnp.zeros((), bool)

        # --- observe (solver.py:487-496) --------------------------------
        loc = _choose_location(wave_p, loc_heuristic, noise, loc_order)
        li, lj = loc // W, loc % W
        cell = wave_p[:, li, lj]
        pattern = _choose_pattern(k_pat, cell, wave_p, weights,
                                  choice_heuristic)
        # one-hot blends, not bool scatters (grid.py onehot_set rationale:
        # narrow-dtype traced-index scatters corrupt at large vmap batch)
        collapsed = jnp.arange(P) == pattern
        at_loc = ((jnp.arange(wave_p.shape[1])[:, None] == li)
                  & (jnp.arange(W) == lj))
        wave_obs = jnp.where(at_loc[None], collapsed[:, None, None], wave_p)
        wave_c, contra_inner = propagate(wave_obs, adj, periodic)

        # --- resolve outcomes -------------------------------------------
        if backtracking:
            # inner contradiction: restore this step's entry wave and ban
            # the tried pattern (solver.py:105-113)
            banned = wave & ~(collapsed[:, None, None] & at_loc[None])
            next_wave = jnp.where(contra_inner, banned, wave_c)
            fatal = contra_top
        else:
            next_wave = wave_c
            fatal = contra_top | contra_inner

        new_status = jnp.where(
            solved, SOLVED,
            jnp.where(~feasible | fatal, CONTRA, RUN)).astype(jnp.int32)
        # keep the original wave on exit paths so argmax stays meaningful
        out_wave = jnp.where(new_status == RUN, next_wave, wave)
        return out_wave, new_status, it + 1, key

    def cond(carry):
        _, status, it, _ = carry
        return (status == RUN) & (it < max_iters)

    if backtracking:
        carry0 = (wave0, jnp.int32(RUN), jnp.int32(0), key)
    else:
        # establish the fixpoint invariant the loop body relies on
        wave0, contra0 = propagate(wave0, adj, periodic)
        carry0 = (wave0, jnp.where(contra0, CONTRA, RUN).astype(jnp.int32),
                  jnp.int32(0), key)

    wave, status, _, _ = jax.lax.while_loop(cond, body, carry0)
    ok = status == SOLVED
    return wave.argmax(0), ok


def solve_with_stats(key, adj, weights, out_shape, periodic: bool,
                     max_attempts: int = 64, log_path: str | None = None,
                     **options):
    """Host-side retry loop recording per-attempt timings and outcomes —
    the analog of the reference's stats dict (wfclogic/control.py:262-284)
    and TSV logger (make_log_stats, :45-61). Use this instrumented variant
    for profiling; the jittable :func:`solve_with_retries` is the
    production path.

    Returns (pattern grid, ok, stats) where stats is a list of
    {"attempt", "time", "success"} dicts.
    """
    import time

    attempt = jax.jit(
        lambda k: solve(k, adj, weights, out_shape, periodic, **options))
    stats = []
    grid, ok = None, False
    for n in range(max_attempts):
        t0 = time.perf_counter()
        grid, ok_a = attempt(jax.random.fold_in(key, n))
        ok = bool(ok_a)
        stats.append({
            "attempt": n,
            "time": time.perf_counter() - t0,
            "success": ok,
        })
        if ok:
            break
    if log_path is not None:
        with open(log_path, "w") as f:
            f.write("attempt\ttime\tsuccess\n")
            for s in stats:
                f.write(f"{s['attempt']}\t{s['time']:.6f}\t{s['success']}\n")
    return grid, ok, stats


def solve_with_retries(key, adj, weights, out_shape, periodic: bool,
                       max_attempts: int = 64, **options):
    """Retry attempts with fresh keys until consistent
    (wfclogic/control.py:231-295). Returns (pattern grid, ok)."""

    def attempt(k):
        return solve(k, adj, weights, out_shape, periodic, **options)

    grid0, ok0 = attempt(jax.random.fold_in(key, 0))

    def cond(carry):
        _, ok, n = carry
        return ~ok & (n < max_attempts)

    def body(carry):
        grid, _, n = carry
        g, ok = attempt(jax.random.fold_in(key, n + 1))
        return jnp.where(ok, g, grid), ok, n + 1

    grid, ok, _ = jax.lax.while_loop(
        cond, body, (grid0, ok0, jnp.ones((), jnp.int32)))
    return grid, ok

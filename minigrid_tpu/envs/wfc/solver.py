"""Jittable Wave Function Collapse solver.

Re-design of the reference solver (``minigrid/envs/wfc/wfclogic/solver.py``):
the wave is a (P, H, W) boolean array; constraint propagation is the same
pad/shift + boolean-matmul fixpoint (solver.py:422-484) under a
``lax.while_loop`` — on TPU the (P, P) @ (P, H*W) products ride the MXU —
and the observe/collapse loop (entropy location heuristic + weighted pattern
choice, solver.py:180-195,321-337) is a second while_loop with per-step key
folding. Contradictions restart the attempt with a fresh key (the retry loop
of wfclogic/control.py:231-295).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


def solve(key, adj, weights, out_shape, periodic: bool, noise_scale=0.1):
    """One WFC attempt. Returns (pattern index grid (H, W), ok)."""
    H, W = out_shape
    P = weights.shape[0]
    wave0 = jnp.ones((P, H, W), bool)
    wave0, contra0 = propagate(wave0, adj, periodic)

    def cond(carry):
        wave, contra, done, it, _ = carry
        return ~contra & ~done & (it < H * W + 1)

    def body(carry):
        wave, _, _, it, key = carry
        key, k_loc, k_pat = jax.random.split(key, 3)
        counts = wave.sum(0)
        unresolved = counts > 1
        # entropy heuristic: argmin(noise + #possible) over unresolved
        # (solver.py:180-195)
        noise = jax.random.uniform(k_loc, (H, W)) * noise_scale
        score = jnp.where(unresolved, noise + counts, jnp.inf)
        loc = jnp.argmin(score.reshape(-1))
        li, lj = loc // W, loc % W

        # weighted pattern choice (solver.py:321-337)
        cell = wave[:, li, lj]
        logits = jnp.where(cell, jnp.log(weights), -jnp.inf)
        pattern = jax.random.categorical(k_pat, logits)

        collapsed = jnp.zeros((P,), bool).at[pattern].set(True)
        wave = wave.at[:, li, lj].set(collapsed)
        wave, contra = propagate(wave, adj, periodic)
        done = (wave.sum(0) == 1).all()
        return wave, contra, done, it + 1, key

    wave, contra, done, _, _ = jax.lax.while_loop(
        cond, body,
        (wave0, contra0, (wave0.sum(0) == 1).all(), jnp.zeros((), jnp.int32),
         key),
    )
    ok = done & ~contra
    return wave.argmax(0), ok


def solve_with_retries(key, adj, weights, out_shape, periodic: bool,
                       max_attempts: int = 64):
    """Retry attempts with fresh keys until consistent
    (wfclogic/control.py:231-295). Returns (pattern grid, ok)."""

    def attempt(k):
        return solve(k, adj, weights, out_shape, periodic)

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

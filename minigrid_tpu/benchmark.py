"""Benchmark CLI (reference minigrid/benchmark.py:13-133, extended).

Reports the reference tool's three single-env metrics — reset latency,
full-frame render FPS, agent-view step FPS — plus the TPU-native headline:
aggregate batched env-steps/s under jit(scan(vmap(step))).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.render import get_frame


def benchmark(env_id: str, num_resets: int = 200, num_frames: int = 5000,
              batch: int = 4096, chunk: int = 256,
              profile_dir: str | None = None):
    """Run the metric suite; with ``profile_dir`` the batched-throughput
    phase runs under ``jax.profiler.trace`` so the device timeline can be
    inspected in xprof/TensorBoard (the SURVEY §5 profiling hook)."""
    env = minigrid_tpu.make(env_id)

    # reset latency (benchmark.py:16-21)
    reset = jax.jit(env.reset)
    jax.block_until_ready(reset(jax.random.PRNGKey(0))[1].grid)
    t0 = time.perf_counter()
    for i in range(num_resets):
        obs, state = reset(jax.random.PRNGKey(i))
    jax.block_until_ready(state.grid)
    reset_ms = (time.perf_counter() - t0) * 1000 / num_resets

    # full-frame rendering FPS (benchmark.py:23-29)
    frame = jax.jit(lambda s: get_frame(env.params, s))
    jax.block_until_ready(frame(state))
    t0 = time.perf_counter()
    for _ in range(num_frames):
        img = frame(state)
    jax.block_until_ready(img)
    render_fps = num_frames / (time.perf_counter() - t0)

    # single-env step + agent-view RGB FPS (benchmark.py:31-43)
    def step_view(carry, _):
        st, key = carry
        key, ka, ks = jax.random.split(key, 3)
        a = jax.random.randint(ka, (), 0, 7)
        _, st, *_ = env.step(ks, st, a)
        img = get_frame(env.params, st, tile_size=8, agent_pov=True)
        return (st, key), img.astype(jnp.int32).sum()

    scan_view = jax.jit(lambda st, k: jax.lax.scan(
        step_view, (st, k), None, length=num_frames)[1].sum())
    jax.block_until_ready(scan_view(state, jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    jax.block_until_ready(scan_view(state, jax.random.PRNGKey(1)))
    view_fps = num_frames / (time.perf_counter() - t0)

    # aggregate batched throughput (TPU-native headline)
    from bench import bench as batched_bench

    agg = None
    try:
        if profile_dir is not None:
            with jax.profiler.trace(profile_dir):
                agg = batched_bench(env_id, batch=batch, chunk=chunk,
                                    repeats=3)
            print(f"profiler trace written to {profile_dir}")
        else:
            agg = batched_bench(env_id, batch=batch, chunk=chunk, repeats=3)
    except Exception:
        pass

    print(f"Env: {env_id}")
    print(f"reset latency      : {reset_ms:.2f} ms")
    print(f"full render        : {render_fps:,.0f} FPS")
    print(f"agent-view steps   : {view_fps:,.0f} FPS (single env, tile 8)")
    if agg:
        print(f"batched throughput : {agg:,.0f} env-steps/s "
              f"({batch} envs)")
    return {
        "reset_ms": reset_ms,
        "render_fps": render_fps,
        "agent_view_fps": view_fps,
        "batched_steps_per_s": agg,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env-id", type=str,
                        default="MiniGrid-LavaGapS7-v0")
    parser.add_argument("--num-resets", type=int, default=200)
    parser.add_argument("--num-frames", type=int, default=5000)
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="write a jax.profiler trace of the batched "
                             "throughput phase to DIR (view with xprof)")
    args = parser.parse_args()
    benchmark(args.env_id, args.num_resets, args.num_frames, args.batch,
              profile_dir=args.profile)


if __name__ == "__main__":
    main()

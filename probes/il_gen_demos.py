"""Round-5 IL sweep, phase 1: generate oracle-bot demo sets.

Grows the round-4 BC demo (300 demos, one level) into a real baseline:
3k+ successful bot episodes per level, saved incrementally to npz so the
BC sweep (probes/il_sweep.py) can consume 300/1k/3k/10k prefixes.
CPU-only (forces the local backend — the TPU tunnel is single-client and
the bot is host-side Python anyway).
"""

from __future__ import annotations

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import minigrid_tpu
from minigrid_tpu.utils.demos import generate_demos

LEVELS = ["BabyAI-GoToRedBallGrey-v0", "BabyAI-GoToLocal-v0"]
TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
CHUNK = 500


def main():
    for level in LEVELS:
        env = minigrid_tpu.make(level)
        path = f"probes/demos_{level}.npz"
        done, start_seed, parts = 0, 0, []
        if os.path.exists(path):
            old = np.load(path)
            parts.append({k: old[k] for k in old.files})
            done = int(old["action"].shape[0])
            start_seed = int(old["seed"].max()) + 1
            print(f"{level}: resuming at {done} demos, seed {start_seed}")
        while done < TARGET:
            n = min(CHUNK, TARGET - done)
            t0 = time.time()
            batch = generate_demos(env, n, start_seed=start_seed,
                                   max_seed_tries=10 * n)
            start_seed = int(batch.seed.max()) + 1
            done += n
            parts.append(batch._asdict())
            # pad all parts to the common T and concatenate
            T = max(p["action"].shape[1] for p in parts)
            merged = {}
            for k in parts[0]:
                arrs = []
                for p in parts:
                    a = p[k]
                    if a.ndim >= 2 and a.shape[1] < T and k != "mission":
                        pad = [(0, 0), (0, T - a.shape[1])] + [(0, 0)] * (
                            a.ndim - 2)
                        a = np.pad(a, pad)
                    arrs.append(a)
                merged[k] = np.concatenate(arrs)
            np.savez_compressed(path, **merged)
            parts = [merged]
            print(f"{level}: {done}/{TARGET} demos "
                  f"({n / (time.time() - t0):.1f} eps/s)", flush=True)


if __name__ == "__main__":
    main()

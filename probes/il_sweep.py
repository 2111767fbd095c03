"""Round-5 IL sweep, phase 2: demos-vs-success curve (VERDICT r4 item 8).

Behavior-clones the ActorCritic policy from growing prefixes of the
oracle-demo sets produced by il_gen_demos.py and reports greedy success
per (level, demo-count). CPU-only (small matmuls; leaves the chip free).
"""

from __future__ import annotations

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import minigrid_tpu
from minigrid_tpu.models.actor_critic import ActorCritic, init_params
from minigrid_tpu.models.bc import behavior_clone
from minigrid_tpu.models.eval import evaluate_success
from minigrid_tpu.utils.demos import DemoBatch

LEVELS = ["BabyAI-GoToRedBallGrey-v0", "BabyAI-GoToLocal-v0"]
COUNTS = [300, 1000, 3000, 10000]


def load_prefix(path: str, n: int) -> DemoBatch:
    z = np.load(path)
    d = {k: z[k][:n] for k in z.files}
    T = int(d["length"].max())
    for k in ("image", "direction", "action", "mask"):
        d[k] = d[k][:, :T]
    return DemoBatch(**d)


def main():
    results = []
    for level in LEVELS:
        path = f"probes/demos_{level}.npz"
        env = minigrid_tpu.make(level)
        budget = 8 * 64  # generous eval cap >= any level budget here
        for n in COUNTS:
            demos = load_prefix(path, n)
            model = ActorCritic(hidden=128)
            params = init_params(jax.random.PRNGKey(0), model=model)
            # more epochs for small sets (the BabyAI IL convention of
            # training to convergence), fewer for the big ones
            epochs = {300: 40, 1000: 30, 3000: 20, 10000: 15}[n]
            params, hist = behavior_clone(model, params, demos,
                                          epochs=epochs, batch_size=256,
                                          lr=1e-3)
            rate = evaluate_success(env, model, params, n_episodes=512,
                                    max_steps=budget,
                                    key=jax.random.PRNGKey(7))
            rec = {"level": level, "demos": n,
                   "bc_accuracy": round(hist[-1]["accuracy"], 4),
                   "greedy_success": round(rate, 4)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
            np.save(f"probes/bc_params_{level}_{n}.npy",
                    np.asarray(jax.tree.flatten(params)[0], dtype=object),
                    allow_pickle=True)
    with open("probes/il_sweep.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

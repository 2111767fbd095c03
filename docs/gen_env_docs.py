"""Documentation generator (reference docs/_scripts/gen_env_docs.py analog):
emits one markdown page per registered environment family from class
docstrings plus a registry index."""

from __future__ import annotations

import os
from collections import defaultdict


def generate(out_dir: str = "docs/environments") -> None:
    import minigrid_tpu
    from minigrid_tpu import registry

    os.makedirs(out_dir, exist_ok=True)
    by_class: dict[type, list[str]] = defaultdict(list)
    for env_id in minigrid_tpu.registered_ids():
        env = registry.make(env_id)
        by_class[type(env)].append(env_id)

    from docs.site_utils import env_name_format, trim_docstring

    index_lines = ["# Environment catalog\n"]
    for cls, ids in sorted(by_class.items(), key=lambda kv: kv[0].__name__):
        name = cls.__name__
        title = env_name_format(name)
        doc = trim_docstring(cls.__doc__)
        path = os.path.join(out_dir, f"{name}.md")
        with open(path, "w") as f:
            f.write(f"# {title}\n\n{doc}\n\n## Registered configurations\n\n")
            for env_id in sorted(ids):
                f.write(f"- `{env_id}`\n")
        index_lines.append(
            f"- [{name}]({name}.md) — {len(ids)} ids")
    with open(os.path.join(out_dir, "index.md"), "w") as f:
        f.write("\n".join(index_lines) + "\n")
    print(f"wrote {len(by_class)} pages to {out_dir}")


def generate_gifs(out_dir: str = "docs/gifs", env_ids=None, steps: int = 40,
                  tile_size: int = 16) -> None:
    """Rollout GIFs (docs/_scripts/gen_gifs.py analog)."""
    import imageio
    import jax
    import numpy as np

    import minigrid_tpu
    from minigrid_tpu.render import get_frame

    os.makedirs(out_dir, exist_ok=True)
    env_ids = env_ids or ["MiniGrid-DoorKey-8x8-v0"]
    for env_id in env_ids:
        env = minigrid_tpu.make(env_id)
        _, state = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        frames = [np.asarray(get_frame(env.params, state,
                                       tile_size=tile_size))]
        rng = np.random.default_rng(0)
        for t in range(steps):
            _, state, _, te, tr, _ = step(jax.random.PRNGKey(t), state,
                                          int(rng.integers(0, 3)))
            frames.append(np.asarray(get_frame(env.params, state,
                                               tile_size=tile_size)))
            if bool(te) or bool(tr):
                break
        imageio.mimsave(os.path.join(out_dir, f"{env_id}.gif"), frames,
                        fps=8)
    print(f"wrote {len(env_ids)} gifs to {out_dir}")


if __name__ == "__main__":
    generate()

"""Environments display-page generator (reference
docs/_scripts/gen_envs_display.py analog): emits a single grid-card HTML
page linking every environment family's doc page, with its GIF where one
exists, plus the reference's `move_404` post-processing step (rewrites the
404 page's relative asset links for site-root serving).

    python docs/gen_envs_display.py [out_dir]
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

CARD = """  <a class="env-card" href="environments/{name}.html">
    {img}
    <div class="env-card-title">{title}</div>
    <div class="env-card-count">{count} registered id{plural}</div>
  </a>
"""

PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Environments</title>
<style>
 body {{ font-family: sans-serif; margin: 2em; }}
 .env-grid {{ display: grid; gap: 1em;
              grid-template-columns: repeat(auto-fill, minmax(220px, 1fr)); }}
 .env-card {{ border: 1px solid #ddd; border-radius: 8px; padding: 1em;
              text-decoration: none; color: inherit; }}
 .env-card img {{ width: 100%; border-radius: 4px; }}
 .env-card-title {{ font-weight: bold; margin-top: .5em; }}
 .env-card-count {{ color: #666; font-size: .9em; }}
</style></head>
<body>
<h1>Environments</h1>
<div class="env-grid">
{cards}</div>
</body></html>
"""


def generate(out_dir: str = "docs") -> str:
    import minigrid_tpu
    from minigrid_tpu import registry

    by_class: dict[type, list[str]] = defaultdict(list)
    for env_id in minigrid_tpu.registered_ids():
        by_class[type(registry.make(env_id))].append(env_id)

    gifs = {os.path.splitext(g)[0]: g
            for g in os.listdir(os.path.join(out_dir, "gifs"))
            if g.endswith(".gif")} if os.path.isdir(
                os.path.join(out_dir, "gifs")) else {}

    cards = []
    for cls, ids in sorted(by_class.items(), key=lambda kv: kv[0].__name__):
        gif = next((gifs[i] for i in sorted(ids) if i in gifs), None)
        img = (f'<img src="gifs/{gif}" alt="{cls.__name__}">' if gif else "")
        cards.append(CARD.format(name=cls.__name__, img=img,
                                 title=cls.__name__, count=len(ids),
                                 plural="s" if len(ids) != 1 else ""))
    path = os.path.join(out_dir, "environments.html")
    with open(path, "w") as f:
        f.write(PAGE.format(cards="".join(cards)))
    return path


def move_404(out_dir: str = "docs") -> str | None:
    """Reference docs/_scripts/move_404.py analog: make the 404 page's
    relative links absolute so it renders from any path depth."""
    path = os.path.join(out_dir, "404.html")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        content = f.read()
    content = content.replace('href="../', 'href="/').replace(
        'src="../', 'src="/')
    with open(path, "w") as f:
        f.write(content)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "docs"
    print(generate(out))
    moved = move_404(out)
    if moved:
        print(moved)

"""Docs-site glue: the last two reference doc-pipeline helpers.

Counterparts of ``docs/_scripts/move_404.py`` (rewrites relative asset
links in a generated 404 page to absolute ones so the page renders from
any URL depth) and the ``docs/_scripts/utils.py`` helpers (docstring
dedent and CamelCase class-name prettification). Original implementations
of the same behaviors; CLI contract matches the reference's
``python move_404.py <path>`` usage.
"""

from __future__ import annotations

import re
import sys
import textwrap


def rewrite_404(path: str) -> None:
    """Make the 404 page's relative href/src links root-absolute
    (reference docs/_scripts/move_404.py:1 — a 404 page is served at
    arbitrary depths, so ``../`` asset links break)."""
    with open(path) as f:
        content = f.read()
    content = re.sub(r'\b(href|src)="\.\./', r'\1="/', content)
    with open(path, "w") as f:
        f.write(content)


def trim_docstring(doc: str | None) -> str:
    """Dedent a docstring PEP-257 style (reference docs/_scripts/utils.py
    ``trim``): first line stripped, common indent of the rest removed,
    leading/trailing blank lines dropped."""
    if not doc:
        return ""
    first, _, rest = doc.expandtabs().partition("\n")
    body = textwrap.dedent(rest).rstrip()
    out = (first.strip() + "\n" + body).strip("\n")
    return out


def env_name_format(name: str) -> str:
    """'KeyCorridorEnv' -> 'Key Corridor' (reference docs/_scripts/utils.py
    ``env_name_format``): split CamelCase (digits stick to their word),
    drop an 'Env' suffix word."""
    words = re.findall(r"[A-Z]+(?![a-z])[0-9]*|[A-Z][a-z]+[0-9]*|[0-9]+",
                       name) or [name]
    return " ".join(w for w in words if w.upper() != "ENV")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print("Provide a path")
    else:
        rewrite_404(sys.argv[1])

"""Mission strings as fixed-shape token arrays.

The reference carries mission instructions as Python strings sampled from a
``MissionSpace`` (``minigrid/core/mission.py:14-199``) and only tokenizes them
in ``DictObservationSpaceWrapper`` (``minigrid/wrappers.py:474-543``). A TPU
observation must be an array, so missions here are int32 token-id vectors of
fixed length :data:`minigrid_tpu.core.types.MISSION_LEN` from the start; the
first 51 vocabulary entries reproduce the reference wrapper's word order (ids
offset by 1, 0 = padding, wrappers.py:535-541) and the tail extends it with
the BabyAI surface-form words (envs/babyai/core/verifier.py:73-103,448-567).
String realization (``detokenize``) is host-side only.
"""

from __future__ import annotations

import numpy as np

from minigrid_tpu.core.types import MISSION_LEN

# Reference word order (wrappers.py:474-533): colors, objects, verbs, extras.
_REFERENCE_WORDS = (
    ["red", "green", "blue", "yellow", "purple", "grey"]
    + [
        "unseen", "empty", "wall", "floor", "box", "key", "ball", "door",
        "goal", "agent", "lava",
    ]
    + [
        "pick", "avoid", "get", "find", "put", "use", "open", "go", "fetch",
        "reach", "unlock", "traverse",
    ]
    + [
        "up", "the", "a", "at", ",", "square", "and", "then", "to", "of",
        "rooms", "near", "opening", "must", "you", "matching", "end",
        "hallway", "object", "from", "room", "maze",
    ]
)

# BabyAI / misc extensions (surface forms in verifier.py and level files).
_EXTRA_WORDS = [
    "next", "on", "your", "left", "right", "in", "front", "behind", "after",
    "side", "what", "is",
]

WORDS: list[str] = _REFERENCE_WORDS + _EXTRA_WORDS
assert len(WORDS) == len(set(WORDS))

# id 0 is padding; words start at 1 (reference offset=1, wrappers.py:535).
WORD_TO_ID = {w: i + 1 for i, w in enumerate(WORDS)}
ID_TO_WORD = {i + 1: w for i, w in enumerate(WORDS)}
VOCAB_SIZE = len(WORDS) + 1


def tokenize(mission: str, length: int = MISSION_LEN) -> np.ndarray:
    """Host-side: mission string -> padded int32 id vector."""
    mission = mission.replace(",", " , ")
    ids = [WORD_TO_ID[w] for w in mission.split()]
    assert len(ids) <= length, f"mission too long ({len(ids)}): {mission!r}"
    out = np.zeros(length, dtype=np.int32)
    out[: len(ids)] = ids
    return out


def detokenize(tokens) -> str:
    """Host-side: id vector -> mission string (inverse of tokenize)."""
    words = [ID_TO_WORD[int(t)] for t in np.asarray(tokens) if int(t) != 0]
    return " ".join(words).replace(" , ", ", ")


def mission_table(missions: list[str], length: int = MISSION_LEN) -> np.ndarray:
    """(N, length) table of tokenized missions, for categorical sampling."""
    return np.stack([tokenize(m, length) for m in missions])

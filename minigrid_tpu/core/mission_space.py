"""MissionSpace — Gymnasium space over instruction strings.

Functional re-implementation of the reference ``MissionSpace``
(``minigrid/core/mission.py:14-199``): a space whose samples are mission
strings produced by ``mission_func(*placeholders)`` with each placeholder
drawn uniformly from its candidate list; ``contains`` reverse-parses a
string against the placeholder lists, handling overlapping candidates by
trying every consistent assignment.
"""

from __future__ import annotations

import itertools
from typing import Callable

import numpy as np

try:
    from gymnasium import spaces as _spaces

    _Base = _spaces.Space
except Exception:  # pragma: no cover - gymnasium always present in CI
    _Base = object


class MissionSpace(_Base):
    def __init__(self, mission_func: Callable[..., str],
                 ordered_placeholders: list[list[str]] | None = None,
                 seed=None):
        if ordered_placeholders is not None:
            assert len(ordered_placeholders) == mission_func.__code__.co_argcount
            for placeholders in ordered_placeholders:
                assert len(placeholders) == len(set(placeholders))
        self.ordered_placeholders = ordered_placeholders
        self.mission_func = mission_func
        if _Base is not object:
            super().__init__(dtype=str, seed=seed)
        # sanity check (reference mission.py:61-64)
        sampled = self.sample()
        assert isinstance(sampled, str)

    def sample(self, mask=None, probability=None) -> str:
        if self.ordered_placeholders is None:
            return self.mission_func()
        rng = getattr(self, "np_random", None) or np.random.default_rng()
        picks = [
            placeholders[rng.integers(0, len(placeholders))]
            for placeholders in self.ordered_placeholders
        ]
        return self.mission_func(*picks)

    def contains(self, x) -> bool:
        if not isinstance(x, str):
            return False
        if self.ordered_placeholders is None:
            return x == self.mission_func()
        # try every placeholder assignment whose realization matches; the
        # candidate lists are small, so brute force over the product is
        # robust against overlapping placeholder strings
        # (mission.py:80-163's span analysis)
        for combo in itertools.product(*self.ordered_placeholders):
            if self.mission_func(*combo) == x:
                return True
        return False

    def __eq__(self, other) -> bool:
        if not isinstance(other, MissionSpace):
            return False
        if (self.ordered_placeholders is None) != (
                other.ordered_placeholders is None):
            return False
        if self.ordered_placeholders is None:
            return self.mission_func() == other.mission_func()
        if [sorted(p) for p in self.ordered_placeholders] != [
                sorted(p) for p in other.ordered_placeholders]:
            return False
        test = [p[0] for p in self.ordered_placeholders]
        return self.mission_func(*test) == other.mission_func(*test)

    def __repr__(self) -> str:
        return f"MissionSpace({self.mission_func}, {self.ordered_placeholders})"

"""Environment registry.

Replaces the Gymnasium registration layer (``minigrid/__init__.py:13-1134``):
every environment ID maps to a zero-arg-callable factory producing a
functional :class:`minigrid_tpu.envs.base.MiniGridEnv`. IDs match the
reference exactly so users can switch by changing one import.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register(env_id: str, factory: Callable, **default_kwargs) -> None:
    if default_kwargs:
        base = factory

        def factory(_base=base, _kw=default_kwargs, **overrides):
            merged = dict(_kw)
            merged.update(overrides)
            return _base(**merged)

    _REGISTRY[env_id] = factory


def make(env_id: str, **kwargs):
    if env_id not in _REGISTRY:
        raise KeyError(
            f"Unknown environment id {env_id!r}; {len(_REGISTRY)} registered."
        )
    return _REGISTRY[env_id](**kwargs)


def registered_ids() -> list[str]:
    return sorted(_REGISTRY)

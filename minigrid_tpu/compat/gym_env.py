"""Gymnasium adapter: the reference's class API over the functional core.

Lets reference-Minigrid users switch with one import: ``GymnasiumAdapter``
implements the ``gym.Env`` contract with the reference's observation dict
(image / direction / mission-string), render modes and metadata
(``minigrid/minigrid_env.py:24-117,741-789``), backed by the jitted
functional env. State lives in the adapter instance; every reset/step is a
device call on the compiled kernels.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import gymnasium as gym
from gymnasium import spaces

import jax

from minigrid_tpu import registry
from minigrid_tpu.core import constants as C
from minigrid_tpu.core.mission_space import MissionSpace
from minigrid_tpu.render import get_frame


class GymnasiumAdapter(gym.Env):
    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 10}

    def __init__(self, env_or_id, render_mode: str | None = None,
                 screen_size: int | None = 640, highlight: bool = True,
                 tile_size: int = C.TILE_PIXELS, agent_pov: bool = False,
                 **env_kwargs):
        self.env = (registry.make(env_or_id, **env_kwargs)
                    if isinstance(env_or_id, str) else env_or_id)
        p = self.env.params

        self.reward_range = getattr(self.env, "reward_range", (0, 1))

        self.render_mode = render_mode
        self.screen_size = screen_size
        self.highlight = highlight
        self.tile_size = tile_size
        self.agent_pov = agent_pov

        self._state = None
        self._np_seed = None
        self._build_runtime()

    def _build_runtime(self):
        """(Re)build the members that cannot survive pickling: compiled
        kernels, pygame handles, and the gym spaces (whose MissionSpace
        holds the env's mission closure). Mirrors the reference contract
        that every env pickles (/root/reference/tests/test_envs.py:180-195)."""
        p = self.env.params
        self.action_space = spaces.Discrete(self.env.num_actions)
        image_space = spaces.Box(0, 255, (p.view_size, p.view_size, 3),
                                 dtype="uint8")
        self.observation_space = spaces.Dict({
            "image": image_space,
            "direction": spaces.Discrete(4),
            "mission": self.env.mission_space(),
        })
        self.window = None
        self.clock = None
        self._reset_fn = jax.jit(self.env.reset)
        self._step_fn = jax.jit(self.env.step)

    def __getstate__(self):
        d = self.__dict__.copy()
        for k in ("_reset_fn", "_step_fn", "window", "clock",
                  "observation_space", "action_space"):
            d.pop(k, None)
        # the spaces themselves are rebuilt (MissionSpace closes over the
        # env), but their np_random generators ARE picklable — carry them
        # so space.seed(n) state survives, as the reference's wholesale
        # space pickling does (/root/reference/tests/test_envs.py:180-195)
        d["_space_rngs"] = {
            "action": getattr(self.action_space, "_np_random", None),
            "observation": getattr(self.observation_space, "_np_random", None),
            "subspaces": {
                k: getattr(s, "_np_random", None)
                for k, s in self.observation_space.spaces.items()
            },
        }
        # device arrays -> host so the payload is portable across backends
        for k in ("_state", "_step_key"):
            if d.get(k) is not None:
                d[k] = jax.tree.map(np.asarray, d[k])
        return d

    def __setstate__(self, d):
        rngs = d.pop("_space_rngs", None)
        self.__dict__.update(d)
        self._build_runtime()
        if rngs:
            if rngs["action"] is not None:
                self.action_space._np_random = rngs["action"]
            if rngs["observation"] is not None:
                self.observation_space._np_random = rngs["observation"]
            for k, r in rngs["subspaces"].items():
                if r is not None and k in self.observation_space.spaces:
                    self.observation_space.spaces[k]._np_random = r

    # -- reference-style introspection ----------------------------------
    @property
    def unwrapped(self):
        return self

    @property
    def agent_pos(self):
        return tuple(np.asarray(self._state.agent_pos))

    @property
    def agent_dir(self) -> int:
        return int(self._state.agent_dir)

    @property
    def carrying(self):
        cell = np.asarray(self._state.carrying)
        if cell[0] == C.EMPTY:
            return None
        return (C.IDX_TO_OBJECT[int(cell[0])], C.IDX_TO_COLOR[int(cell[1])])

    @property
    def step_count(self) -> int:
        return int(self._state.step_count)

    @property
    def max_steps(self) -> int:
        extra = self._state.extra if self._state is not None else None
        if isinstance(extra, dict) and "max_steps" in extra:
            return int(extra["max_steps"])
        return self.env.params.max_steps

    @property
    def mission(self) -> str:
        return self.env.mission_text(self._state)

    @property
    def width(self) -> int:
        return self.env.params.width

    @property
    def height(self) -> int:
        return self.env.params.height

    def encode_grid(self) -> np.ndarray:
        """(W, H, 3) symbolic grid (the reference ``grid.encode()``)."""
        return np.asarray(self._state.grid[..., :3])

    def hash(self, size: int = 16) -> str:
        """State fingerprint (minigrid_env.py:159-169)."""
        import hashlib

        sample_hash = hashlib.sha256()
        for item in [self.encode_grid().tolist(), self.agent_pos,
                     self.agent_dir]:
            sample_hash.update(str(item).encode("utf8"))
        return sample_hash.hexdigest()[:size]

    @property
    def steps_remaining(self) -> int:
        return self.max_steps - self.step_count

    # -- gym API ---------------------------------------------------------
    def _obs_to_host(self, obs) -> dict[str, Any]:
        return {
            "image": np.asarray(obs["image"]),
            "direction": int(obs["direction"]),
            "mission": self.mission,
        }

    def reset(self, *, seed: int | None = None,
              options: dict | None = None):
        super().reset(seed=seed)
        if seed is not None:
            self._np_seed = seed
        key = jax.random.PRNGKey(
            self._np_seed if self._np_seed is not None
            else int(self.np_random.integers(0, 2**31 - 1)))
        self._np_seed = None
        obs, self._state = self._reset_fn(key)
        self._step_key = jax.random.fold_in(key, 0x5EED)
        if self.render_mode == "human":
            self.render()
        return self._obs_to_host(obs), {}

    def step(self, action):
        self._step_key, sub = jax.random.split(self._step_key)
        obs, self._state, reward, term, trunc, _ = self._step_fn(
            sub, self._state, int(action))
        if self.render_mode == "human":
            self.render()
        return (self._obs_to_host(obs), float(reward), bool(term),
                bool(trunc), {})

    def get_frame(self, highlight: bool = True,
                  tile_size: int = C.TILE_PIXELS, agent_pov: bool = False):
        return np.asarray(get_frame(self.env.params, self._state,
                                    highlight=highlight, tile_size=tile_size,
                                    agent_pov=agent_pov))

    def render(self):
        img = self.get_frame(self.highlight, self.tile_size, self.agent_pov)
        if self.render_mode == "human":
            self._render_human(img)
        elif self.render_mode == "rgb_array":
            return img

    def _render_human(self, img):
        """Pygame window loop (minigrid_env.py:744-782)."""
        import pygame
        import pygame.freetype

        img = np.transpose(img, axes=(1, 0, 2))
        if self.window is None:
            pygame.init()
            pygame.display.init()
            self.window = pygame.display.set_mode(
                (self.screen_size, self.screen_size))
            pygame.display.set_caption("minigrid-tpu")
        if self.clock is None:
            self.clock = pygame.time.Clock()
        surf = pygame.surfarray.make_surface(img)
        offset = surf.get_size()[0] * 0.1
        bg = pygame.Surface(
            (int(surf.get_size()[0] + offset), int(surf.get_size()[1] + offset)))
        bg.convert()
        bg.fill((255, 255, 255))
        bg.blit(surf, (offset / 2, 0))
        bg = pygame.transform.smoothscale(
            bg, (self.screen_size, self.screen_size))
        font_size = 22
        text = self.mission
        font = pygame.freetype.SysFont(
            pygame.font.get_default_font(), font_size)
        text_rect = font.get_rect(text, size=font_size)
        text_rect.center = bg.get_rect().center
        text_rect.y = bg.get_height() - font_size * 1.5
        font.render_to(bg, text_rect, text, size=font_size)
        self.window.blit(bg, (0, 0))
        pygame.event.pump()
        self.clock.tick(self.metadata["render_fps"])
        pygame.display.flip()

    def close(self):
        if self.window:
            import pygame

            pygame.quit()


def gym_make(env_id: str, **kwargs) -> GymnasiumAdapter:
    """Reference-style construction: ``gym_make("MiniGrid-Empty-8x8-v0")``."""
    return GymnasiumAdapter(env_id, **kwargs)

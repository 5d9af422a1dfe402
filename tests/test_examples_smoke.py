"""CI smoke tests for the five example scenarios (VERDICT r4 item 7).

The reference treats its examples as the ONLY verification path (reference
README.md:30-35: generate a solver, run the closed-loop sim, watch the
robot); here they additionally must not rot, so each one is executed
headless for a few truncated steps on the CPU backend. Full-length
goal-reaching runs live in the closed-loop tests; this only asserts the
scripts build, solve, and step without crashing.
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.join(os.path.dirname(HERE), "examples")

SCRIPTS = [
    "point_robot_example.py",
    "panda_example.py",
    "boxer_example.py",
    "boxer_example_global.py",
    "boxer_example_supermarket.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_example_smoke(script):
    env = dict(os.environ)
    env["MPC_EXAMPLE_STEPS"] = "5"
    env["MPC_EXAMPLE_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script)],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=EXAMPLES,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"

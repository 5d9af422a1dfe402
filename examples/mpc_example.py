"""Shared example scaffold (reference ``examples/mpc_example.py``).

Builds the problem + planner from a config file and wires the configured
constraint/objective names to the planner's parameter setters. Examples run
headless against the in-repo kinematic simulator — no pybullet required —
and print the goal-reaching outcome (the reference's only success criterion,
``boxer_example.py:219-224``).
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

# allow running examples as plain scripts without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CI smoke knobs (tests/test_examples_smoke.py): MPC_EXAMPLE_PLATFORM pins
# the backend (the axon TPU plugin overrides JAX_PLATFORMS env at import,
# so this must go through jax.config after import), MPC_EXAMPLE_STEPS
# truncates episodes
if os.environ.get("MPC_EXAMPLE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MPC_EXAMPLE_PLATFORM"])

from robot_mpcs_tpu.config import Setup, load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.planner.mpc_planner import MPCPlanner
from robot_mpcs_tpu.sim.kinematic_sim import KinematicSim

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "config")


def episode_steps(default: int):
    """(n_steps, smoke_mode) honoring the MPC_EXAMPLE_STEPS CI knob.

    In smoke mode (knob set) the episode is truncated, so "goal not
    reached" is expected and must not fail the script — only crashes and
    solver failures should.
    """
    v = os.environ.get("MPC_EXAMPLE_STEPS")
    return (int(v), True) if v else (default, False)


class SphereObstacle:
    def __init__(self, position, radius):
        self._position = list(position)
        self._radius = float(radius)

    def position(self):
        return self._position

    def radius(self):
        return self._radius

    def dimension(self):
        return 3


class MpcExample:
    """Base harness: config parse, model build, planner construction,
    parameter wiring (reference ``mpc_example.py:26-119``)."""

    def __init__(self, config_file_name: str):
        self._config_file = config_file_name
        match = re.search(r"([a-zA-Z]+)Mpc", os.path.basename(config_file_name))
        self._robot_type = match.group(1) if match else "robot"
        self.setup: Setup = load_setup(config_file_name)
        self._goal = None
        self._obstacles = []
        self._r_body = 0.2
        self._limits = None
        self._limits_u = None
        self._limits_vel = None

    def initialize_environment(self):  # overridden per robot
        raise NotImplementedError

    def build(self):
        self.problem = MpcProblem(self.setup)
        self.planner = MPCPlanner(self.problem)
        self.planner.reset()
        self.sim = KinematicSim(self.problem.dims, self.setup.mpc.time_step)

    def set_mpc_parameter(self):
        """Dispatch configured objective/constraint names to planner setters
        (reference ``mpc_example.py:63-119``)."""
        cfg = self.setup.mpc
        for objective in cfg.objectives:
            if objective == "GoalReaching":
                if self._goal is not None:
                    self.planner.setGoalReaching(self._goal)
            elif objective == "ConstraintAvoidance":
                self.planner.setConstraintAvoidance()
            elif objective == "GoalMpcObjective":
                pass  # legacy objective packs its own weights at reset
            else:
                print(f"No mpc parameter setter for objective {objective}")
                sys.exit(1)
        for constraint in cfg.constraints:
            if constraint == "RadialConstraints":
                self.planner.setRadialConstraints(self._obstacles, self._r_body)
            elif constraint == "SelfCollisionAvoidanceConstraints":
                self.planner.setSelfCollisionAvoidanceConstraints(self._r_body)
            elif constraint == "JointLimitConstraints":
                self.planner.setJointLimits(
                    (self._limits[:, 0], self._limits[:, 1])
                )
            elif constraint == "VelLimitConstraints":
                self.planner.setVelLimits(
                    (self._limits_vel[:, 0], self._limits_vel[:, 1])
                )
            elif constraint == "InputLimitConstraints":
                self.planner.setInputLimits(
                    (self._limits_u[:, 0], self._limits_u[:, 1])
                )
            elif constraint == "LinearConstraints":
                pass  # per-step perception pipeline sets these
            else:
                print(f"No mpc parameter setter for constraint {constraint}")
                sys.exit(1)
        self.planner.concretize()

    def check_goal_reaching(self, ee_pos, epsilon: float = 0.2) -> bool:
        goal = np.asarray(self._goal)[: len(ee_pos)]
        return bool(np.linalg.norm(np.asarray(ee_pos) - goal) < epsilon)

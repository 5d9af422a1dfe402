"""Closed-loop MPC tests on the in-repo kinematic sim.

Mirrors the reference's only verification workflow (examples as manual
integration tests, reference ``examples/pointRobot_example.py:77-89`` +
goal-reaching criterion ``boxer_example.py:219-224``) but automated: the
robot must reach the goal within tolerance, without violating the obstacle
clearance, in a bounded number of steps.
"""

import os

import numpy as np
import pytest

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.planner.mpc_planner import MPCPlanner
from robot_mpcs_tpu.sim.kinematic_sim import KinematicSim

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "config")


class _Sphere:
    def __init__(self, pos, radius):
        self._pos, self._r = list(pos), radius

    def position(self):
        return self._pos

    def radius(self):
        return self._r

    def dimension(self):
        return 3


@pytest.mark.slow
def test_point_robot_reaches_goal_around_obstacle():
    setup = load_setup(os.path.join(CONFIG_DIR, "pointRobotMpc.yaml"))
    # The reference's ConstraintAvoidance formula scales the inverse-clearance
    # repulsion by N inside each stage (constraint_avoidance.py:22-31, kept
    # for config parity); with the stock wconstr=0.5 the equilibrium sits ~1 m
    # off the goal. Use a small repulsion weight so the goal dominates and the
    # hard radial constraint does the collision avoidance.
    setup.mpc.weights["wconstr"] = [0.005, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)
    planner = MPCPlanner(problem)
    planner.reset()

    goal = [3.0, 0.5, 0.0]
    # directly on the start->goal line: the robot must swerve around it
    obstacle = _Sphere([1.5, 0.25, 0.05], 0.4)
    r_body = 0.2
    planner.setGoalReaching(goal)
    planner.setRadialConstraints([obstacle], r_body)
    planner.setJointLimits(([-10.0] * 3, [10.0] * 3))
    planner.setInputLimits(([-5.0] * 3, [5.0] * 3))
    planner.setSelfCollisionAvoidanceConstraints(r_body)
    planner.setConstraintAvoidance()
    planner.concretize()

    sim = KinematicSim(problem.dims, setup.mpc.time_step)
    ob = sim.reset(np.zeros(problem.dims.nx))

    min_clearance = np.inf
    reached_at = None
    for step in range(400):
        q, qdot = sim.observation()
        action, output, exitflag = planner.computeAction(q, qdot)
        assert exitflag >= 0, f"solver failed at step {step}"
        ob = sim.step(action)
        pos = np.array([ob[0], ob[1], 0.05])
        clearance = (
            np.linalg.norm(pos - np.array(obstacle.position()))
            - obstacle.radius()
            - r_body
        )
        min_clearance = min(min_clearance, clearance)
        dist_goal = np.linalg.norm(pos[:2] - np.array(goal[:2]))
        if dist_goal < 0.15:
            reached_at = step
            break

    assert reached_at is not None, (
        f"goal not reached; final state {ob[:3]}, min clearance {min_clearance}"
    )
    assert min_clearance > -0.05, f"obstacle violated: clearance {min_clearance}"


@pytest.mark.slow
def test_boxer_diffdrive_reaches_goal():
    setup = load_setup(os.path.join(CONFIG_DIR, "boxerMpc.yaml"))
    problem = MpcProblem(setup)
    planner = MPCPlanner(problem)
    planner.reset()

    goal = [2.0, 1.0]
    planner.setGoalReaching(goal)
    # one permissive halfplane per stage (reference boxer_example.py:95 uses
    # [1, 0, 0, -100] as the inactive default)
    N = setup.mpc.time_horizon
    lin = [[np.array([1.0, 0.0, 0.0, -100.0])] for _ in range(N)]
    planner.setLinearConstraints(lin, r_body=0.3)
    planner.setJointLimits(([-10.0] * 3, [10.0] * 3))
    planner.setInputLimits(([-5.0, -5.0], [5.0, 5.0]))
    planner.concretize()

    sim = KinematicSim(problem.dims, setup.mpc.time_step)
    ob = sim.reset(np.zeros(problem.dims.nx))

    reached = False
    for step in range(300):
        q, qdot, vel = sim.observation()
        action, output, exitflag = planner.computeAction(q, qdot, vel)
        assert exitflag >= 0
        ob = sim.step(action)
        # ee_link sits 0.4 m ahead of the base (builtin boxer model)
        ee = ob[:2] + 0.4 * np.array([np.cos(ob[2]), np.sin(ob[2])])
        if np.linalg.norm(ee - np.array(goal)) < 0.15:
            reached = True
            break
    assert reached, f"boxer did not reach goal; final pose {ob[:3]}"

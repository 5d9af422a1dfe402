"""Planner runtime behaviors: interval decimation, dynamic-obstacle
extrapolation, and the flagship panda closed loop.

Mirrors the reference contracts: ``computeAction`` re-solves every
``interval`` steps and replays the cached action otherwise (reference
``mpcPlanner.py:293-301``); ``updateDynamicObstacles`` writes a
constant-acceleration prediction per stage into the obstacle parameter
slots (``mpcPlanner.py:144-161``).
"""

import numpy as np
import pytest

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.planner.mpc_planner import MPCPlanner
from robot_mpcs_tpu.sim.kinematic_sim import KinematicSim

from tests.conftest import config_path


@pytest.fixture(scope="module")
def point_planner():
    setup = load_setup(config_path("pointRobotMpc.yaml"))
    setup.mpc.weights["wconstr"] = [0.005, 0, 0, 0]
    problem = MpcProblem(setup)
    planner = MPCPlanner(problem)
    planner.reset()
    planner.setGoalReaching([2.0, 0.0, 0.0])
    planner.setJointLimits(([-10.0] * 3, [10.0] * 3))
    planner.setInputLimits(([-5.0] * 3, [5.0] * 3))
    planner.concretize()
    return planner


def test_interval_decimation_replays_cached_action(point_planner):
    planner = point_planner
    planner._config.interval = 3
    planner.concretize()
    q = np.zeros(3)
    qdot = np.zeros(3)
    a0, _, _ = planner.computeAction(q, qdot)  # solve
    a1, _, _ = planner.computeAction(q + 0.3, qdot)  # cached (state ignored)
    a2, _, _ = planner.computeAction(q + 0.6, qdot)  # cached
    a3, _, _ = planner.computeAction(q + 0.9, qdot)  # re-solve
    np.testing.assert_array_equal(a0, a1)
    np.testing.assert_array_equal(a0, a2)
    assert not np.array_equal(a0, a3)
    planner._config.interval = 1
    planner.concretize()


def test_dynamic_obstacle_constant_accel_extrapolation(point_planner):
    planner = point_planner
    pm = planner._problem.param_map
    dims = planner._problem.dims
    dt = planner._problem.dt
    # obstacle state [pos, vel, acc] in R^3 each
    pos = np.array([1.0, 0.5, 0.0])
    vel = np.array([0.2, 0.0, 0.0])
    acc = np.array([0.0, 0.1, 0.0])
    planner.updateDynamicObstacles(np.concatenate([pos, vel, acc]))
    params = planner.params  # (N, npar)
    start, k = pm.entries["obst"]
    per = dims.m_obst + 1
    for i in (0, dims.N - 1):
        t = dt * i
        expected = pos + vel * t + 0.5 * acc * t * t
        got = params[i, start : start + per][: dims.m_obst]
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_panda_reaches_goal():
    """Flagship 7-dof arm closed loop: reach a workspace goal with joint,
    input, radial and self-collision constraints active."""
    setup = load_setup(config_path("pandaMpc.yaml"))
    setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)
    planner = MPCPlanner(problem)
    planner.reset()
    goal = [0.4, 0.3, 0.6]
    planner.setGoalReaching(goal)

    class _Sphere:
        def position(self):
            return [0.2, -0.4, 0.8]

        def radius(self):
            return 0.15

        def dimension(self):
            return 3

    planner.setRadialConstraints([_Sphere()], 0.1)
    planner.setSelfCollisionAvoidanceConstraints(0.05)
    lim = problem.kin.joint_limits
    planner.setJointLimits((lim[:, 0], lim[:, 1]))
    planner.setInputLimits(([-5.0] * 7, [5.0] * 7))
    planner.setConstraintAvoidance()
    planner.concretize()

    sim = KinematicSim(problem.dims, setup.mpc.time_step)
    x0 = np.zeros(problem.dims.nx)
    x0[: problem.dims.n] = [0.0, -0.8, 0.0, -2.0, 0.0, 1.5, 0.0]
    sim.reset(x0)
    fk = problem.kin.fk_pos
    reached = False
    for step in range(150):
        q, qdot = sim.observation()
        action, _, flag = planner.computeAction(q, qdot)
        assert flag >= 0, f"exitflag {flag} at step {step}"
        sim.step(action)
        ee = np.asarray(fk(np.asarray(sim.observation()[0], np.float32)))
        if np.linalg.norm(ee - goal) < 0.05:
            reached = True
            break
    assert reached, f"panda did not reach goal; final ee error {np.linalg.norm(ee - goal):.3f}"

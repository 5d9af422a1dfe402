"""Fleet (batched + sharded) execution tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh

import os

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "config")


@pytest.fixture(scope="module")
def point_problem():
    setup = load_setup(os.path.join(CONFIG_DIR, "pointRobotMpc.yaml"))
    setup.mpc.weights["wconstr"] = [0.005, 0.0, 0.0, 0.0]
    return MpcProblem(setup)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_fleet_runs_sharded(point_problem):
    mesh = make_mesh()
    B = 16  # 2 scenarios per device
    runner = FleetRunner(point_problem, batch_size=B, mesh=mesh)
    scenario = random_fleet_scenario(
        point_problem, B, seed=3,
        goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
        obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),  # obstacles out of the way
    )
    state, metrics = runner.run(scenario, n_steps=30)
    assert float(metrics.converged_fraction) == 1.0
    assert np.isfinite(float(metrics.mean_cost))
    # goal distances shrink substantially from the initial random placement
    assert float(metrics.mean_goal_distance) < 0.5


@pytest.mark.slow
def test_fleet_matches_single_scenario(point_problem):
    """A fleet of identical scenarios must produce identical trajectories."""
    mesh = make_mesh()
    B = 8
    scenario = random_fleet_scenario(
        point_problem, B, seed=5,
        obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),
    )
    # make all rows identical to row 0
    xinit = np.tile(np.asarray(scenario.xinit[0]), (B, 1))
    params = np.tile(np.asarray(scenario.params[0]), (B, 1, 1))
    scenario = scenario._replace(
        xinit=jax.numpy.asarray(xinit), params=jax.numpy.asarray(params)
    )
    runner = FleetRunner(point_problem, batch_size=B, mesh=mesh)
    state, _ = runner.run(scenario, n_steps=10)
    xs = np.asarray(state.x)
    np.testing.assert_allclose(xs, np.tile(xs[0:1], (B, 1)), atol=5e-4, rtol=1e-4)

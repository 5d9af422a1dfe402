"""Checkpoint/resume of fleet state (aux subsystem absent in the reference,
SURVEY §5 'Checkpoint / resume: none')."""

import os

import jax
import numpy as np
import pytest

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh
from robot_mpcs_tpu.utils.checkpoint import load_fleet_state, save_fleet_state

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "config")


@pytest.fixture(scope="module")
def point_problem():
    setup = load_setup(os.path.join(CONFIG_DIR, "pointRobotMpc.yaml"))
    setup.mpc.weights["wconstr"] = [0.005, 0.0, 0.0, 0.0]
    return MpcProblem(setup)


def _tree_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_roundtrip_preserves_state(point_problem, tmp_path):
    mesh = make_mesh()
    B = 8
    runner = FleetRunner(point_problem, batch_size=B, mesh=mesh)
    scenario = runner.shard_scenario(
        random_fleet_scenario(
            point_problem, B, seed=5,
            goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
            obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),
        )
    )
    state = runner.init_state(scenario)
    for _ in range(3):
        state, _ = runner.step(state, scenario)
    # step() donates its input state; snapshot to host before checkpointing
    snap = jax.device_get(state)

    path = str(tmp_path / "fleet.npz")
    save_fleet_state(path, state, extra={"seed": 5})
    restored, extra = load_fleet_state(path, mesh=mesh)

    assert extra == {"seed": 5}
    assert int(restored.step) == 3
    assert _tree_equal(snap, jax.device_get(restored))


@pytest.mark.slow
def test_resume_is_bitwise_identical_to_uninterrupted(point_problem, tmp_path):
    """Run 6 steps straight vs 3 steps -> checkpoint -> restore -> 3 steps."""
    mesh = make_mesh()
    B = 8
    runner = FleetRunner(point_problem, batch_size=B, mesh=mesh)
    scenario = runner.shard_scenario(
        random_fleet_scenario(
            point_problem, B, seed=7,
            goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
            obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),
        )
    )

    state = runner.init_state(scenario)
    for _ in range(6):
        state, _ = runner.step(state, scenario)
    straight = jax.device_get(state)

    state = runner.init_state(scenario)
    for _ in range(3):
        state, _ = runner.step(state, scenario)
    path = str(tmp_path / "mid.npz")
    save_fleet_state(path, state)
    resumed, _ = load_fleet_state(path, mesh=mesh)
    for _ in range(3):
        resumed, _ = runner.step(resumed, scenario)

    assert int(resumed.step) == 6
    assert _tree_equal(straight, jax.device_get(resumed))


def test_restore_onto_different_topology(point_problem, tmp_path):
    """Checkpoint on the 8-device mesh, restore on a 4-device mesh."""
    mesh8 = make_mesh()
    B = 8
    runner8 = FleetRunner(point_problem, batch_size=B, mesh=mesh8)
    scenario = runner8.shard_scenario(
        random_fleet_scenario(
            point_problem, B, seed=9,
            goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
            obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),
        )
    )
    state = runner8.init_state(scenario)
    state, _ = runner8.step(state, scenario)
    snap = jax.device_get(state)
    path = str(tmp_path / "topo.npz")
    save_fleet_state(path, state)

    mesh4 = make_mesh(devices=jax.devices()[:4])
    restored, _ = load_fleet_state(path, mesh=mesh4)
    assert _tree_equal(snap, jax.device_get(restored))
    # and the state is actually steppable on the new mesh
    runner4 = FleetRunner(point_problem, batch_size=B, mesh=mesh4)
    scenario4 = runner4.shard_scenario(jax.device_get(scenario))
    stepped, metrics = runner4.step(restored, scenario4)
    assert int(stepped.step) == 2
    assert np.isfinite(float(metrics.mean_cost))


def test_fleet_metrics_report_iterations(point_problem):
    mesh = make_mesh()
    B = 8
    runner = FleetRunner(point_problem, batch_size=B, mesh=mesh)
    scenario = runner.shard_scenario(
        random_fleet_scenario(
            point_problem, B, seed=11,
            goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
            obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),
        )
    )
    state = runner.init_state(scenario)
    _, metrics = runner.step(state, scenario)
    assert float(metrics.mean_iterations) >= 1.0
    assert int(metrics.max_iterations) >= int(np.ceil(float(metrics.mean_iterations)))


def test_checkpoint_rejects_wrong_problem(tmp_path):
    """Restoring a checkpoint into a different problem class must fail with a
    clear shape-provenance error, not an opaque jit shape error later."""
    import pytest

    from robot_mpcs_tpu.config import load_setup
    from robot_mpcs_tpu.models.problem import MpcProblem
    from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
    from robot_mpcs_tpu.utils.checkpoint import load_fleet_state, save_fleet_state

    from tests.conftest import config_path

    setup = load_setup(config_path("pointRobotMpc.yaml"))
    problem = MpcProblem(setup)
    runner = FleetRunner(problem, batch_size=8)
    scenario = random_fleet_scenario(problem, 8, seed=0)
    state = runner.init_state(runner.shard_scenario(scenario))
    path = str(tmp_path / "ckpt.npz")
    save_fleet_state(path, state)

    # same problem + batch: loads fine
    load_fleet_state(path, problem=problem, batch_size=8)

    # different problem class (panda): must raise with the mismatching dims
    other = MpcProblem(load_setup(config_path("pandaMpc.yaml")))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_fleet_state(path, problem=other)
    with pytest.raises(ValueError, match="batch"):
        load_fleet_state(path, problem=problem, batch_size=16)

"""Mixed-robot fleet (EP-analog grouped batching) on the 8-device CPU mesh.

SURVEY §2 expert-parallelism row: "heterogeneous robot models in one batch
-> grouped batching per model type"; BASELINE fleet config: "4096 randomized
scenarios (mixed robots/goals/obstacles)". The reference binds a single
generated solver per process (reference robotmpcs/planner/mpcPlanner.py:43-73)
and cannot do this at all.
"""

import os

import numpy as np
import pytest

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet_group import (
    FleetGroup,
    mixed_fleet_scenarios,
)
from robot_mpcs_tpu.parallel.mesh import make_mesh

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "config")


def _load(name, **weight_overrides):
    setup = load_setup(os.path.join(CONFIG_DIR, name))
    setup.mpc.weights.update(weight_overrides)
    return MpcProblem(setup)


@pytest.fixture(scope="module")
def mixed_problems():
    return {
        "pointRobot": (_load("pointRobotMpc.yaml", wconstr=[0.005, 0, 0, 0]), 16),
        "panda": (_load("pandaMpc.yaml", wconstr=[0.05, 0, 0, 0]), 16),
        "boxer": (_load("boxerMpc.yaml"), 16),
    }


# easy randomized scenarios per class: obstacles parked far away, reachable
# goals (panda goals inside the workspace sphere; planar goals for the bases)
SAMPLERS = {
    "pointRobot": dict(
        goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
        obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),
    ),
    "panda": dict(
        goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 1.0)),
        obstacle_box=((5, 5, 0.2), (6, 6, 1.0)),
    ),
    "boxer": dict(
        goal_box=((-2, -2, 0.0), (2, 2, 0.0)),
        obstacle_box=((5, 5, 0.0), (6, 6, 0.0)),
    ),
}


@pytest.mark.slow
def test_mixed_fleet_steps_all_classes(mixed_problems):
    mesh = make_mesh()
    assert mesh.devices.size == 8
    group = FleetGroup(mixed_problems, mesh=mesh)
    assert group.total_batch == 48
    scenarios = mixed_fleet_scenarios(
        mixed_problems, seed=11, sampler_kwargs=SAMPLERS
    )
    states, metrics = group.run(scenarios, n_steps=10)

    # per-class metrics exist and are finite for all three robot families
    assert set(metrics.per_class) == {"pointRobot", "panda", "boxer"}
    for name, m in metrics.per_class.items():
        assert np.isfinite(float(m.mean_cost)), name
        assert float(m.reset_fraction) == 0.0, name
        assert float(m.converged_fraction) > 0.5, (
            name, float(m.converged_fraction))

    # the holonomic classes' solves genuinely converge on easy scenarios
    assert float(metrics.per_class["pointRobot"].converged_fraction) == 1.0

    # aggregate is the batch-weighted combination
    agg = float(metrics.overall.converged_fraction)
    expect = np.mean(
        [float(m.converged_fraction) for m in metrics.per_class.values()]
    )  # equal sub-batches -> plain mean
    assert agg == pytest.approx(expect, abs=1e-6)
    assert float(metrics.overall.max_violation) == pytest.approx(
        max(float(m.max_violation) for m in metrics.per_class.values()), abs=1e-7
    )

    # every class's fleet actually makes progress toward its goals
    for name, m in metrics.per_class.items():
        assert float(m.mean_goal_distance) < 1.5, (
            name, float(m.mean_goal_distance))


@pytest.mark.slow
def test_mixed_fleet_matches_isolated_runners(mixed_problems):
    """Grouped stepping must be bit-identical to stepping each class alone
    (grouping is a scheduling construct, not a numerical one)."""
    from robot_mpcs_tpu.parallel.fleet import FleetRunner

    mesh = make_mesh()
    sub = {k: mixed_problems[k] for k in ("pointRobot", "boxer")}
    scenarios = mixed_fleet_scenarios(sub, seed=3, sampler_kwargs=SAMPLERS)

    group = FleetGroup(sub, mesh=mesh)
    g_states, _ = group.run(scenarios, n_steps=3)

    for name, (problem, batch) in sub.items():
        runner = FleetRunner(problem, batch_size=batch, mesh=mesh)
        s_state, _ = runner.run(scenarios[name], n_steps=3)
        np.testing.assert_array_equal(
            np.asarray(g_states[name].x), np.asarray(s_state.x)
        )

"""Long-horizon panda-fleet quality: the throughput number must belong to a
USEFUL controller (VERDICT r3 weak #8), not merely a converged solver.

The panda analog of test_fleet.py's pointRobot goal-reaching test: 100
receding-horizon steps over a sharded 8-device fleet must park every arm's
end-effector at its goal with zero resets and no self-collision, mirroring
the reference's only programmatic success criterion
(reference examples/boxer_example.py:219-224 check_goal_reaching).
"""

import os

import jax
import numpy as np
import pytest

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "config")


@pytest.mark.slow
def test_panda_fleet_reaches_goals_long_horizon():
    setup = load_setup(os.path.join(CONFIG_DIR, "pandaMpc.yaml"))
    # stock wconstr=0.5 with the reference's N-scaled repulsion parks the
    # arm off-goal (see objectives.ConstraintAvoidance); same sane weight
    # bench.py uses
    setup.mpc.weights["wconstr"] = [0.05, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)
    mesh = make_mesh()
    B = 64
    r_body = 0.2
    runner = FleetRunner(problem, batch_size=B, mesh=mesh)
    scenario = random_fleet_scenario(
        problem, B, seed=17, r_body=r_body,
        # reachable workspace goals; one real obstacle per scenario placed
        # in the workspace margin (the sampler rejects placements that
        # collide with the start pose or swallow the goal)
        goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 0.9)),
        obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
    )
    state, metrics = runner.run(scenario, n_steps=100)

    assert float(metrics.reset_fraction) == 0.0
    # the fleet's steady state: arms parked on their goals
    assert float(metrics.mean_goal_distance) < 0.1, (
        f"mean goal distance {float(metrics.mean_goal_distance):.3f}"
    )
    assert float(metrics.converged_fraction) > 0.95

    # no self-collision anywhere in the final fleet state
    pairs = problem.robot.self_collision_pairs
    assert pairs
    xs = np.asarray(jax.device_get(state.x))
    q = xs[:, : problem.dims.n]

    @jax.jit
    @jax.vmap
    def pair_clearance(qq):
        return jax.numpy.stack([
            jax.numpy.linalg.norm(
                problem.kin.fk_pos(qq, a) - problem.kin.fk_pos(qq, b)
            )
            for a, b in pairs
        ])

    clear = np.asarray(pair_clearance(q))
    assert clear.min() > 2 * r_body - 1e-3, (
        f"self-collision clearance violated: {clear.min():.4f}"
    )

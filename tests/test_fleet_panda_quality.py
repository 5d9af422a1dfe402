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
    # Parking weight for the soft repulsion: the N-scaled inverse-clearance
    # term (objectives.ConstraintAvoidance, reference semantics) balances
    # the goal gradient 2*w*d at d ~ wconstr*N/(2*w*c^2) — stock 0.5 parks
    # the arm ~0.15 m off-goal even with the obstacle far away. 0.005 makes
    # the equilibrium offset ~mm while OBSTACLE SAFETY stays guaranteed by
    # the hard RadialConstraints (asserted below via actual clearance).
    setup.mpc.weights["wconstr"] = [0.005, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)
    mesh = make_mesh()
    B = 64
    r_body = 0.2
    runner = FleetRunner(problem, batch_size=B, mesh=mesh)
    scenario = random_fleet_scenario(
        problem, B, seed=17, r_body=r_body,
        # goals sampled as FK images of random configurations: reachable by
        # construction (a plain box sample puts goals outside the ~0.85 m
        # panda workspace and mean_goal_distance saturates at the
        # unreachable residual). One real obstacle per scenario; the
        # sampler rejects placements that collide with the start pose or
        # swallow the goal.
        goal_box=((-0.5, -0.5, 0.2), (0.5, 0.5, 0.9)),
        obstacle_box=((-0.8, -0.8, 0.2), (0.8, 0.8, 1.0)),
        reachable_goals=True,
    )
    # 300 steps = 15 s sim time. Pre-r5, ~7/64 lanes orbited the obstacle
    # barrier in a local minimum forever (recorded in VERDICT r4 item 5);
    # the randomized warm-start kick (FleetRunner kick_*) re-seeds
    # plateaued lanes into different basins, so stuck lanes are now a
    # hard-bounded tail, asserted per-lane below.
    state, metrics = runner.run(scenario, n_steps=300)

    assert float(metrics.reset_fraction) == 0.0
    # the fleet's steady state: arms parked on their goals
    assert float(metrics.mean_goal_distance) < 0.1, (
        f"mean goal distance {float(metrics.mean_goal_distance):.3f}"
    )
    assert float(metrics.converged_fraction) > 0.95

    # per-lane tail bound (VERDICT r4 item 5): at most 2/64 lanes may
    # remain > 0.2 m from their goal after the escape mechanism
    pm_ = problem.param_map
    params0_ = np.asarray(jax.device_get(scenario.params))[:, 0]
    g_start, g_k = pm_.entries["goal"]
    goals = params0_[:, g_start : g_start + g_k]
    xs_ = np.asarray(jax.device_get(state.x))
    ee = np.asarray(
        jax.jit(
            jax.vmap(lambda qq: problem.kin.fk_pos(qq, problem.robot.end_link))
        )(jax.numpy.asarray(xs_[:, : problem.dims.n]))
    )
    lane_gdist = np.linalg.norm(ee[:, :g_k] - goals, axis=1)
    n_stuck = int((lane_gdist > 0.2).sum())
    assert n_stuck <= 2, (
        f"{n_stuck}/64 lanes stuck > 0.2 m from goal: "
        f"{np.sort(lane_gdist)[-6:]}"
    )

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

    # obstacle safety is enforced by the HARD RadialConstraints, not the
    # (deliberately small) soft repulsion weight — check the real
    # link-obstacle clearance of the final fleet state
    links = list(problem.robot.collision_links)
    fkl = jax.jit(jax.vmap(lambda qq: problem.kin.fk_pos_links(qq, links)))
    P = np.asarray(fkl(q))  # (B, L, 3)
    pm = problem.param_map
    params0 = np.asarray(jax.device_get(scenario.params))[:, 0]
    start, k = pm.entries["obst"]
    obst = params0[:, start : start + 4]  # one obstacle: (x, y, z, r)
    obstacle_clear = (
        np.linalg.norm(P - obst[:, None, :3], axis=-1)
        - obst[:, None, 3]
        - r_body
    ).min()
    assert obstacle_clear > -1e-3, (
        f"obstacle clearance violated: {obstacle_clear:.4f}"
    )

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


def test_fault_injection_brakes_and_resets(point_problem):
    """Failure detection (SURVEY §5: the reference only prints on
    exitflag < 0, mpcPlanner.py:263-264): a scenario whose parameters are
    poisoned with NaN must (a) be flagged non-converged, (b) execute a brake
    (zero action), (c) have its warm start cold-restarted — while healthy
    lanes in the same batch proceed untouched.
    """
    mesh = make_mesh()
    B = 8
    runner = FleetRunner(point_problem, batch_size=B, mesh=mesh)
    scenario = random_fleet_scenario(
        point_problem, B, seed=13,
        goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
        obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),
    )
    params = np.asarray(scenario.params).copy()
    params[0] = np.nan  # poison lane 0 only
    scenario = scenario._replace(params=jax.numpy.asarray(params))
    scenario = runner.shard_scenario(scenario)

    state0 = runner.init_state(scenario)
    x_before = np.asarray(state0.x).copy()
    state, metrics = runner.step(state0, scenario)

    assert float(metrics.reset_fraction) == pytest.approx(1.0 / B)
    assert float(metrics.converged_fraction) <= (B - 1) / B
    x_after = np.asarray(state.x)
    dims = point_problem.dims
    # braked lane: plant stepped with u = 0 from a zero-velocity start -> frozen
    np.testing.assert_allclose(x_after[0], x_before[0], atol=1e-6)
    # its warm start is the cold restart (states pinned to x_next, [s,u] zeroed)
    z0 = np.asarray(state.z_warm)[0]
    np.testing.assert_allclose(z0[:, dims.nx:], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        z0[:, :dims.nx], np.tile(x_after[0], (dims.N, 1)), atol=1e-6
    )
    assert np.all(np.asarray(state.lam)[0] == 0.0)
    # healthy lanes moved and kept finite warm starts
    assert np.all(np.isfinite(x_after[1:]))
    assert np.any(np.abs(x_after[1:] - x_before[1:]) > 1e-6)


def test_stall_recovery_cold_restarts_persistent_nonconverged(point_problem):
    """A lane that ends several consecutive steps unconverged must have its
    warm start cold-restarted (stall recovery): contradictory joint limits
    (lb > ub) make one lane permanently infeasible (exitflag 0, finite),
    while healthy lanes keep their shifted warm starts."""
    mesh = make_mesh(devices=jax.devices()[:1])
    B = 8
    runner = FleetRunner(
        point_problem, batch_size=B, mesh=mesh,
        compaction_ratio=0, stall_reset_after=3,
    )
    scenario = random_fleet_scenario(
        point_problem, B, seed=2,
        goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
        obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),
    )
    params = np.asarray(scenario.params).copy()
    pm = point_problem.param_map
    dims0 = point_problem.dims.n
    lo, k = pm.entries["lower_limits"]
    hi, k2 = pm.entries["upper_limits"]
    # lane 0: MILDLY contradictory box (lb > ub by 0.05): no feasible point
    # exists, but the least-violation iterate sits ~0.025 deep — far below
    # the 0.5 usability guard, so the plan executes and the warm start is
    # kept; only the stall counter can see the lane is never going to reach
    # exitflag 1
    params[0, :, lo : lo + k] = 0.30
    params[0, :, hi : hi + k2] = 0.25
    # start lane 0 inside the contradiction band (and goal nearby) so its
    # steady violation is ~0.025, comfortably under the usability guard
    g0, gk = pm.entries["goal"]
    params[0, :, g0 : g0 + gk] = 0.275
    xinit = np.asarray(scenario.xinit).copy()
    xinit[0, : dims0] = 0.275
    xinit[0, dims0:] = 0.0
    scenario = scenario._replace(
        xinit=jax.numpy.asarray(xinit), params=jax.numpy.asarray(params)
    )
    scenario = runner.shard_scenario(scenario)
    state = runner.init_state(scenario)

    dims = point_problem.dims
    stalls = []
    for _ in range(3):
        state, metrics = runner.step(state, scenario)
        stalls.append(int(np.asarray(state.stall)[0]))
        assert int(np.asarray(state.stall)[1:].max()) == 0  # healthy lanes
    assert float(metrics.reset_fraction) == 0.0  # lane is usable, not reset
    # counter climbs 1, 2, then hits the threshold at step 3: reset to 0...
    assert stalls == [1, 2, 0], stalls
    # ...and the warm start rebuilt cold at that step: [s, u] zeroed, every
    # stage's state pinned to the new plant state
    z0 = np.asarray(state.z_warm)[0]
    x0 = np.asarray(state.x)[0]
    np.testing.assert_allclose(z0[:, dims.nx:], 0.0, atol=1e-6)
    np.testing.assert_allclose(z0[:, : dims.nx], np.tile(x0, (dims.N, 1)), atol=1e-6)
    assert np.all(np.asarray(state.lam)[0] == 0.0)
    # healthy lanes kept their (nonzero) shifted warm starts
    assert np.any(np.abs(np.asarray(state.z_warm)[1:, :, dims.nx:]) > 1e-6)
    # the cycle repeats: one more unconverged step re-climbs the counter
    state, metrics = runner.step(state, scenario)
    assert int(np.asarray(state.stall)[0]) == 1
    # converged_fraction reflects exactly the one bad lane
    assert float(metrics.converged_fraction) == pytest.approx(1 - 1 / B)


@pytest.mark.slow
def test_straggler_compaction_rescues_unconverged(point_problem):
    """Phase-1-starved lanes must be rescued by the compacted second phase:
    with a 1-AL phase-1 budget, the rescue pass lifts the converged fraction
    at least to the level of a plain full-budget run, and rescued lanes
    report summed (phase-1 + phase-2) iteration counts."""
    import dataclasses

    mesh = make_mesh(devices=jax.devices()[:2])
    B = 64
    scenario = random_fleet_scenario(point_problem, B, seed=7)
    cfg = point_problem.setup.solver

    starved = FleetRunner(
        point_problem, B, mesh=mesh,
        solver_cfg=dataclasses.replace(cfg, max_al_iterations=1),
        compaction_ratio=0,
    )
    _, m_starved = starved.run(scenario, n_steps=2)

    rescued = FleetRunner(
        point_problem, B, mesh=mesh,
        compaction_ratio=4, phase1_al_iterations=1,
    )
    assert rescued._k_loc == 8
    _, m_rescued = rescued.run(scenario, n_steps=2)

    full = FleetRunner(point_problem, B, mesh=mesh, compaction_ratio=0)
    _, m_full = full.run(scenario, n_steps=2)

    assert float(m_rescued.converged_fraction) >= float(m_starved.converged_fraction)
    assert float(m_rescued.converged_fraction) >= float(m_full.converged_fraction) - 0.05
    # rescue appends iterations rather than replacing them
    assert float(m_rescued.max_iterations) <= cfg.max_al_iterations * (
        1 + cfg.max_al_iterations
    ) * cfg.max_ilqr_iterations
    assert np.isfinite(float(m_rescued.mean_cost))


def test_plateau_kick_fires_and_perturbs(point_problem):
    """Local-minimum escape: a lane whose goal distance plateaus while far
    from goal gets a randomized warm-start kick (controls perturbed,
    multipliers zeroed, plateau counter reset); lanes near their goal or
    still improving are untouched."""
    import jax.numpy as jnp

    from robot_mpcs_tpu.parallel.mesh import make_mesh

    B = 8
    runner = FleetRunner(
        point_problem, batch_size=B, mesh=make_mesh(devices=jax.devices()[:2]),
        rescue_tiers=[], kick_after=3, kick_gdist=0.15, kick_scale=0.5,
    )
    scenario = random_fleet_scenario(
        point_problem, B, seed=5,
        goal_box=((3.0, 3.0, 0.05), (4.0, 4.0, 0.05)),  # far goals
        obstacle_box=((50.0, 50.0, 0.05), (51.0, 51.0, 0.05)),
    )
    scen = runner.shard_scenario(scenario)
    state = runner.init_state(scen)
    # freeze the plant: zero out goal weights so the fleet cannot move
    # toward the goal -> gdist plateaus by construction
    pm = point_problem.param_map
    params = np.asarray(jax.device_get(scen.params)).copy()
    start, k = pm.entries["wgoal"]
    params[:, :, start : start + k] = 0.0
    scen = scen._replace(params=runner.shard_scenario(
        type(scen)(xinit=scen.xinit, params=jnp.asarray(params))).params)

    kicked_z = None
    for i in range(8):
        state, metrics = runner.step(state, scen)
        ni = np.asarray(jax.device_get(state.no_improve))
        if i >= 3 and kicked_z is None and (ni == 0).any():
            # the counter reset to 0 while gdist stayed large: the kick
            # fired THIS step, so this state's warm start carries the noise
            # (the NEXT solve will optimize it away again — that is the
            # point of a restart)
            kicked_z = np.asarray(jax.device_get(state.z_warm))
    assert kicked_z is not None, "plateaued lanes were never kicked"
    # the kick must actually perturb the control tail of the warm start:
    # with zero goal weight and no obstacle, an unkicked fleet keeps a
    # (near-)zero control plan; kicked lanes carry injected noise
    dims = point_problem.dims
    w_tail = np.abs(kicked_z[:, :, dims.nx :])
    assert w_tail.max() > 1e-2, "kick noise never reached the warm start"

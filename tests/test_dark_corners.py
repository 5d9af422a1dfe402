"""End-to-end coverage of the rarely-exercised configuration corners:
``control_mode: vel``, ``slack: True``, the legacy ``GoalMpcObjective``, and
the (previously silent) sampler/kernel fallbacks.

The reference ships all of these code paths but executes none of them in any
automated way (it has no tests at all, SURVEY §4); here each one runs a real
solve or closed loop.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.planner.mpc_planner import MPCPlanner
from robot_mpcs_tpu.sim.kinematic_sim import KinematicSim

from tests.conftest import config_path


def _point_setup(**mpc_overrides):
    setup = load_setup(config_path("pointRobotMpc.yaml"))
    setup.mpc.weights["wconstr"] = [0.005, 0.0, 0.0, 0.0]
    for k, v in mpc_overrides.items():
        setattr(setup.mpc, k, v)
    return setup


def _wire_point_planner(problem, goal):
    planner = MPCPlanner(problem)
    planner.reset()
    planner.setGoalReaching(goal)

    class FarObstacle:
        def position(self):
            return [50.0, 50.0, 0.0]

        def radius(self):
            return 0.1

        def dimension(self):
            return 3

    planner.setRadialConstraints([FarObstacle()], 0.2)
    planner.setJointLimits(([-10.0] * 3, [10.0] * 3))
    planner.setInputLimits(([-5.0] * 3, [5.0] * 3))
    planner.setConstraintAvoidance()
    planner.concretize()
    return planner


@pytest.mark.slow
def test_vel_mode_closed_loop_boxer():
    """Diffdrive boxer under ``control_mode: vel``: the extracted action is a
    velocity command (stage-2 velocity block, reference mpcPlanner.py:275-276)
    driving a velocity-controlled plant to the goal."""
    setup = load_setup(config_path("boxerMpc.yaml"))
    setup.mpc.control_mode = "vel"
    setup.mpc.constraints = ["InputLimitConstraints"]
    problem = MpcProblem(setup)
    planner = MPCPlanner(problem)
    planner.reset()
    goal = [2.0, 0.5]
    planner.setGoalReaching(goal)
    planner.setInputLimits(([-3.0, -3.0], [3.0, 3.0]))
    planner.concretize()

    sim = KinematicSim(problem.dims, setup.mpc.time_step)
    sim.reset(np.zeros(problem.dims.nx))
    d0 = np.linalg.norm(goal)
    for step in range(120):
        q, qdot, vel = sim.observation()
        action, _, flag = planner.computeAction(q, qdot, vel)
        assert flag >= 0
        assert action.shape == (2,)  # (v_forward, omega) velocity command
        sim.step_velocity(action)
        if np.linalg.norm(sim.state[:2] - goal) < 0.2:
            break
    assert np.linalg.norm(sim.state[:2] - goal) < 0.5 * d0


@pytest.mark.slow
def test_slack_closed_loop_point_robot():
    """``slack: True`` end-to-end: solves carry the slack variable through
    bounds/objective/constraint shift and the closed loop still reaches the
    goal with negligible slack activation."""
    setup = _point_setup(slack=True)
    problem = MpcProblem(setup)
    assert problem.dims.ns == 1
    goal = [2.0, -0.5, 0.0]
    planner = _wire_point_planner(problem, goal)
    sim = KinematicSim(problem.dims, setup.mpc.time_step)
    sim.reset(np.zeros(problem.dims.nx))
    for step in range(150):
        q, qdot = sim.observation()
        action, _, flag = planner.computeAction(q, qdot)
        assert flag >= 0
        sim.step(action)
        if np.linalg.norm(sim.state[:2] - goal[:2]) < 0.15:
            break
    assert np.linalg.norm(sim.state[:2] - goal[:2]) < 0.15
    # slack monitor mirrors reference mpcPlanner.py:282-285; an unconstrained
    # run must not lean on slack
    assert abs(planner._slack) < 1e-2


def test_vel_slack_extraction_slice():
    """The vel-mode action with slack enabled is the stage-2 VELOCITY block —
    the reference's raw z[-2nu:-nu] slice would grab [s, qdot[:-1]] instead
    (its slack-blind quirk, reference mpcPlanner.py:275-276)."""
    setup = _point_setup(slack=True, control_mode="vel")
    problem = MpcProblem(setup)
    planner = _wire_point_planner(problem, [1.0, 1.0, 0.0])
    ob = np.zeros(problem.dims.nx)
    action, output, result, flag = planner.solve(ob)
    z1 = np.asarray(result.z)[1]
    n = problem.dims.n
    np.testing.assert_array_equal(action, z1[n : 2 * n])


@pytest.mark.slow
def test_goal_mpc_objective_solves():
    """Legacy GoalMpcObjective (reference goal_mpc_objective.py, never
    instantiated by any reference config): a direct solve drives the point
    robot toward g with damped velocity."""
    setup = _point_setup(
        objectives=["GoalMpcObjective"],
        constraints=["RadialConstraints", "InputLimitConstraints"],
    )
    problem = MpcProblem(setup)
    pm = problem.param_map
    dims = problem.dims
    params = np.zeros((dims.N, problem.npar), np.float32)
    pm.set_np(params, "w", [1.0] * dims.m)
    pm.set_np(params, "wvel", [0.1] * (dims.nx - dims.n))
    pm.set_np(params, "wobst", 0.01)
    pm.set_np(params, "wu", [0.05] * dims.nu)
    pm.set_np(params, "g", [1.5, 0.5, 0.0])
    pm.set_np(params, "r_body", 0.1)
    pm.set_np(params, "obst", [50.0, 50.0, 50.0, 0.1])
    pm.set_np(params, "lower_limits_u", [-5.0] * dims.nu)
    pm.set_np(params, "upper_limits_u", [5.0] * dims.nu)

    solve = problem.build_solver()
    x = np.zeros(dims.nx, np.float32)
    z0 = np.zeros((dims.N, dims.nz), np.float32)
    lam = np.zeros((dims.N, problem.n_con), np.float32)
    F = problem.dynamics
    for _ in range(60):
        res = solve(jnp.asarray(x), jnp.asarray(params), jnp.asarray(z0), jnp.asarray(lam))
        # full convergence, same bar as every other end-to-end test — the
        # legacy objective is smooth least-squares + inverse-square obstacle
        # cost, nothing about it justifies a weaker exitflag contract
        assert int(res.exitflag) == 1, (
            int(res.exitflag), float(res.violation), float(res.grad_norm))
        u = np.asarray(res.z)[0, -dims.nu :]
        x = np.asarray(F(jnp.asarray(x), jnp.asarray(u)))
        z0 = np.concatenate([np.asarray(res.z)[1:], np.asarray(res.z)[-1:]])
        lam = np.concatenate([np.asarray(res.lam)[1:], np.asarray(res.lam)[-1:]])
        if np.linalg.norm(x[:2] - [1.5, 0.5]) < 0.1:
            break
    assert np.linalg.norm(x[:2] - [1.5, 0.5]) < 0.1


def test_rejection_sampler_exhaustion_warns():
    """Impossible clearance geometry must warn, not silently ship violated
    scenarios (the round-2 silent-cap finding)."""
    from robot_mpcs_tpu.parallel.fleet import random_fleet_scenario

    setup = _point_setup()
    problem = MpcProblem(setup)
    with pytest.warns(UserWarning, match="rejection sampling exhausted"):
        random_fleet_scenario(
            problem,
            8,
            seed=0,
            obstacle_box=((0.0, 0.0, 0.0), (0.01, 0.01, 0.01)),
            obstacle_radius=(5.0, 5.0),
        )


def test_pallas_vmem_fallback_warns():
    """A problem too large for the Pallas kernel's VMEM budget must warn
    when it silently falls back to the scan backward."""
    import jax

    from robot_mpcs_tpu.config import SolverConfiguration
    from robot_mpcs_tpu.solver.al_ilqr import StageFunctions, build_solver

    nx, nu, N = 20, 10, 12
    # state-DEPENDENT dynamics Jacobian so A is batched under vmap (the
    # batched-dynamics case is what blows the kernel's VMEM budget)
    dyn = lambda x, u: x + 0.01 * jnp.concatenate([jnp.sin(x[nu:]) * u, u])
    cost = lambda x, w, p: jnp.sum(x * x) + jnp.sum(w * w)
    ineq = lambda x, w, p: jnp.zeros((0,), x.dtype)
    cfg = SolverConfiguration(
        riccati_backend="pallas", max_al_iterations=1, max_ilqr_iterations=1
    )
    solve = build_solver(
        StageFunctions(dyn, cost, ineq),
        nx=nx, ns=0, nu=nu, N=N, n_con=0,
        w_lb=-np.inf, w_ub=np.inf, cfg=cfg,
    )
    B = 2
    xinit = jnp.zeros((B, nx))
    params = jnp.zeros((B, N, 1))
    z0 = jnp.zeros((B, N, nx + nu))
    with pytest.warns(UserWarning, match="VMEM"):
        res = jax.vmap(solve)(xinit, params, z0)
    assert np.isfinite(np.asarray(res.cost)).all()

"""Solver unit tests: canned NLPs with scipy oracle + constraint activation."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from robot_mpcs_tpu.config import SolverConfiguration
from robot_mpcs_tpu.solver.al_ilqr import StageFunctions, build_solver


def _double_integrator_solver(N=8, dt=0.1, goal=1.0, wu=0.01, u_lim=None,
                              cfg=None, structured=True):
    """1-D double integrator, quadratic goal cost on position."""
    nx, nu, ns = 2, 1, 0

    def dynamics(x, u):
        # exact discretization of qdd = u
        return jnp.array([x[0] + dt * x[1] + 0.5 * dt**2 * u[0], x[1] + dt * u[0]])

    def cost(x, w, p):
        return (x[0] - goal) ** 2 + 0.1 * x[1] ** 2 + wu * w[0] ** 2

    if u_lim is None:
        n_con = 0
        ineq = lambda x, w, p: jnp.zeros((0,), dtype=x.dtype)
    else:
        n_con = 2
        ineq = lambda x, w, p: jnp.array([w[0] + u_lim, u_lim - w[0]])
    w_lb, w_ub = [-100.0], [100.0]  # bounds handled via AL rows only

    if structured:
        values = lambda x, w, p: jnp.concatenate(
            [jnp.array([x[0] - goal, x[1], w[0]]), ineq(x, w, p)]
        )
        weights = lambda p: (jnp.array([1.0, 0.1, wu]), jnp.zeros((0,)))
        stage = StageFunctions(dynamics, cost, ineq, values, weights)
        n_res = 3
    else:
        stage = StageFunctions(dynamics, cost, ineq)
        n_res = 0

    solve = build_solver(
        stage,
        nx=nx, ns=ns, nu=nu, N=N, n_con=n_con, n_res=n_res, n_bar=0,
        w_lb=w_lb, w_ub=w_ub,
        cfg=cfg or SolverConfiguration(),
    )
    return solve, dynamics


def _oracle_solution(N, dt, goal, wu, u_lim=None):
    """scipy SLSQP on the identical transcription (decision = controls)."""

    def rollout(us):
        x = np.zeros(2)
        xs = []
        for k in range(N):
            xs.append(x.copy())
            x = np.array([x[0] + dt * x[1] + 0.5 * dt**2 * us[k], x[1] + dt * us[k]])
        return np.array(xs)

    def f(us):
        xs = rollout(us)
        return np.sum((xs[:, 0] - goal) ** 2 + 0.1 * xs[:, 1] ** 2 + wu * us**2)

    bounds = [(-u_lim, u_lim)] * N if u_lim else None
    res = minimize(f, np.zeros(N), method="SLSQP", bounds=bounds,
                   options={"maxiter": 500, "ftol": 1e-12})
    return res.x, rollout(res.x), res.fun


def test_unconstrained_matches_scipy():
    N, dt, goal, wu = 8, 0.1, 1.0, 0.01
    solve, _ = _double_integrator_solver(N, dt, goal, wu)
    z0 = np.zeros((N, 3), dtype=np.float32)
    res = jax.jit(solve)(jnp.zeros(2), jnp.zeros((N, 1)), jnp.asarray(z0))
    u_star, x_star, f_star = _oracle_solution(N, dt, goal, wu)
    got_u = np.asarray(res.z[:, 2])
    got_cost = float(res.cost)
    assert int(res.exitflag) >= 0
    np.testing.assert_allclose(got_cost, f_star, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got_u, u_star, atol=2e-2)


def test_constrained_matches_scipy():
    N, dt, goal, wu, ulim = 8, 0.1, 2.0, 0.001, 3.0
    # cold-started strict-accuracy solve: give the AL loop a full budget and
    # strict exit tolerances (the defaults trade polish for warm-started
    # fleet throughput; accuracy level is configuration, not hard-coded)
    cfg = SolverConfiguration(
        max_al_iterations=15,
        max_ilqr_iterations=15,
        line_search_steps=8,
        tol_gradient=1e-5,
        tol_stationarity=1e-4,
        tol_constraint=1e-5,
        penalty_initial=10.0,
    )
    solve, _ = _double_integrator_solver(N, dt, goal, wu, u_lim=ulim, cfg=cfg)
    z0 = np.zeros((N, 3), dtype=np.float32)
    res = jax.jit(solve)(
        jnp.zeros(2), jnp.zeros((N, 1)), jnp.asarray(z0),
        jnp.zeros((N, 2)),
    )
    u_star, _, f_star = _oracle_solution(N, dt, goal, wu, u_lim=ulim)
    got_u = np.asarray(res.z[:, 2])
    assert int(res.exitflag) == 1
    # constraint respected (to AL tolerance)
    assert np.max(np.abs(got_u)) <= ulim + 1e-2
    np.testing.assert_allclose(float(res.cost), f_star, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_u, u_star, atol=1e-2)


def test_batched_solve_vmap():
    N, dt, wu = 8, 0.1, 0.01
    solve, _ = _double_integrator_solver(N, dt, goal=1.0, wu=wu)
    B = 16
    xinits = np.stack([np.array([x, 0.0]) for x in np.linspace(-1, 1, B)]).astype(np.float32)
    z0 = np.zeros((B, N, 3), dtype=np.float32)
    params = np.zeros((B, N, 1), dtype=np.float32)
    batched = jax.jit(jax.vmap(lambda xi, p, z: solve(xi, p, z)))
    res = batched(jnp.asarray(xinits), jnp.asarray(params), jnp.asarray(z0))
    assert res.z.shape == (B, N, 3)
    assert np.all(np.asarray(res.exitflag) == 1)
    # every scenario moves toward the goal over the horizon, and terminal
    # positions are monotone in the start position
    term = np.asarray(res.z[:, -1, 0])
    assert np.all(np.abs(term - 1.0) < np.abs(xinits[:, 0] - 1.0) + 1e-6)
    assert np.all(np.diff(term) > 0)


def test_warm_start_reduces_iterations():
    N, dt = 8, 0.1
    solve, _ = _double_integrator_solver(N, dt, goal=1.0, wu=0.01)
    jsolve = jax.jit(solve)
    res1 = jsolve(jnp.zeros(2), jnp.zeros((N, 1)), jnp.zeros((N, 3)))
    # warm start from the solution: should converge immediately
    res2 = jsolve(jnp.zeros(2), jnp.zeros((N, 1)), res1.z)
    assert float(res2.grad_norm) <= max(1e-4, float(res1.grad_norm))


def test_nan_inputs_flagged():
    N = 8
    solve, _ = _double_integrator_solver(N, 0.1, goal=1.0, wu=0.01)
    bad = jnp.full(2, jnp.nan)
    res = jax.jit(solve)(bad, jnp.zeros((N, 1)), jnp.zeros((N, 3)))
    assert int(res.exitflag) == -1


def test_generic_fallback_matches_structured():
    """The unstructured (exact-Hessian) path must reach the same optimum."""
    N, dt, goal, wu = 8, 0.1, 1.0, 0.01
    s1, _ = _double_integrator_solver(N, dt, goal, wu, structured=True)
    s2, _ = _double_integrator_solver(N, dt, goal, wu, structured=False)
    r1 = jax.jit(s1)(jnp.zeros(2), jnp.zeros((N, 1)), jnp.zeros((N, 3)))
    r2 = jax.jit(s2)(jnp.zeros(2), jnp.zeros((N, 1)), jnp.zeros((N, 3)))
    np.testing.assert_allclose(float(r1.cost), float(r2.cost), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(r1.z), np.asarray(r2.z), atol=5e-3)


def test_constant_dyn_jacobians_same_solution():
    """Passing analytic constant (A, B) must match autodiff Jacobians."""
    N, dt, goal, wu = 8, 0.1, 1.0, 0.01
    solve_ad, dynamics = _double_integrator_solver(N, dt, goal, wu)
    A = np.array([[1.0, dt], [0.0, 1.0]], np.float32)
    B = np.array([[0.5 * dt**2], [dt]], np.float32)
    values = lambda x, w, p: jnp.array([x[0] - goal, x[1], w[0]])
    weights = lambda p: (jnp.array([1.0, 0.1, wu]), jnp.zeros((0,)))
    ineq = lambda x, w, p: jnp.zeros((0,), dtype=x.dtype)
    stage = StageFunctions(dynamics, None, ineq, values, weights, dyn_jac=(A, B))
    solve_const = build_solver(
        stage, nx=2, ns=0, nu=1, N=N, n_con=0, n_res=3, n_bar=0,
        w_lb=[-100.0], w_ub=[100.0], cfg=SolverConfiguration(),
    )
    r1 = jax.jit(solve_ad)(jnp.zeros(2), jnp.zeros((N, 1)), jnp.zeros((N, 3)))
    r2 = jax.jit(solve_const)(jnp.zeros(2), jnp.zeros((N, 1)), jnp.zeros((N, 3)))
    np.testing.assert_allclose(np.asarray(r1.z), np.asarray(r2.z), atol=1e-4)

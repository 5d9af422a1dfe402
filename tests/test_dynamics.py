"""Dynamics + integrator tests against scipy's adaptive RK45 oracle."""

import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from robot_mpcs_tpu.models.dimensions import ProblemDimensions
from robot_mpcs_tpu.models.dynamics import (
    make_continuous_dynamics,
    make_discrete_dynamics,
)


def test_holonomic_double_integrator():
    dims = ProblemDimensions.build(n_arm=3, base_type="holonomic", N=10)
    f = make_continuous_dynamics(dims)
    x = jnp.array([1.0, 2.0, 3.0, 0.1, 0.2, 0.3])
    u = jnp.array([-1.0, 0.5, 0.0])
    xdot = np.asarray(f(x, u))
    np.testing.assert_allclose(xdot, [0.1, 0.2, 0.3, -1.0, 0.5, 0.0])


def test_diffdrive_matches_reference_structure():
    # boxer: n=3, nx=8, nu=2 (reference diff_drive_mpc_model.py:10-12)
    dims = ProblemDimensions.build(n_arm=0, base_type="diffdrive", N=10)
    assert (dims.n, dims.nx, dims.nu) == (3, 8, 2)
    f = make_continuous_dynamics(dims)
    theta, v, w = 0.6, 1.2, -0.4
    x = jnp.array([5.0, -1.0, theta, 0.0, 0.0, 0.0, v, w])
    u = jnp.array([0.3, -0.2])
    xdot = np.asarray(f(x, u))
    expected = [np.cos(theta) * v, np.sin(theta) * v, w, 0, 0, 0, 0.3, -0.2]
    np.testing.assert_allclose(xdot, expected, rtol=1e-6)


def test_diffdrive_with_arm_dims():
    # diffdrive + 7-dof arm: n=10, nx=22, nu=9
    dims = ProblemDimensions.build(n_arm=7, base_type="diffdrive", N=10)
    assert (dims.n, dims.nx, dims.nu) == (10, 22, 9)
    f = make_continuous_dynamics(dims)
    x = jnp.arange(22, dtype=jnp.float32) * 0.1
    u = jnp.arange(9, dtype=jnp.float32) * 0.01
    xdot = np.asarray(f(x, u))
    assert xdot.shape == (22,)
    # arm position rows integrate arm qdot rows
    np.testing.assert_allclose(xdot[3:10], np.asarray(x[13:20]), rtol=1e-6)
    # base qdot rows stay zero
    np.testing.assert_allclose(xdot[10:13], 0.0)
    # vel rows integrate u[:2]
    np.testing.assert_allclose(xdot[20:22], np.asarray(u[:2]), rtol=1e-5)


def _rk45_oracle(fnp, x0, u, dt):
    sol = solve_ivp(lambda t, x: fnp(x, u), (0, dt), x0, rtol=1e-10, atol=1e-12)
    return sol.y[:, -1]


def test_erk2_accuracy_diffdrive():
    """ERK2 with 4 substeps must track the dense oracle to integrator order."""
    dims = ProblemDimensions.build(n_arm=0, base_type="diffdrive", N=10)
    dt = 0.1
    F = make_discrete_dynamics(dims, dt, "erk2", substeps=4)
    fnp = lambda x, u: np.asarray(
        make_continuous_dynamics(dims)(jnp.asarray(x), jnp.asarray(u))
    )
    x0 = np.array([0.0, 0.0, 0.3, 0, 0, 0, 1.0, 0.8])
    u = np.array([0.5, -0.3])
    got = np.asarray(F(jnp.asarray(x0, jnp.float32), jnp.asarray(u, jnp.float32)))
    want = _rk45_oracle(fnp, x0, u, dt)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_erk4_tighter_than_erk2():
    dims = ProblemDimensions.build(n_arm=0, base_type="diffdrive", N=10)
    dt = 0.1
    fnp = lambda x, u: np.asarray(
        make_continuous_dynamics(dims)(jnp.asarray(x), jnp.asarray(u))
    )
    x0 = np.array([0.0, 0.0, 0.3, 0, 0, 0, 1.0, 0.8])
    u = np.array([0.5, -0.3])
    want = _rk45_oracle(fnp, x0, u, dt)
    errs = {}
    for name in ("euler", "erk2", "erk4"):
        F = make_discrete_dynamics(dims, dt, name, substeps=4)
        got = np.asarray(F(jnp.asarray(x0, jnp.float32), jnp.asarray(u, jnp.float32)))
        errs[name] = np.max(np.abs(got - want))
    assert errs["erk2"] < errs["euler"]
    assert errs["erk4"] <= errs["erk2"] + 1e-6


def test_holonomic_exact_for_double_integrator():
    """RK2 is exact for the linear double integrator (piecewise-constant u)."""
    dims = ProblemDimensions.build(n_arm=2, base_type="holonomic", N=5)
    dt = 0.05
    F = make_discrete_dynamics(dims, dt, "erk2", substeps=4)
    x0 = jnp.array([1.0, -1.0, 0.5, 0.25])
    u = jnp.array([2.0, -4.0])
    got = np.asarray(F(x0, u))
    q = np.asarray(x0[:2]) + np.asarray(x0[2:]) * dt + 0.5 * np.asarray(u) * dt**2
    qd = np.asarray(x0[2:]) + np.asarray(u) * dt
    np.testing.assert_allclose(got, np.concatenate([q, qd]), rtol=1e-6)

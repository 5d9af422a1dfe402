"""Consistency of the two-family (split) Gauss-Newton expansion.

The split path (``MpcProblem.split_callbacks`` + the ``split`` branch of
``build_solver``) must agree with first principles:

* its stage gradient is the EXACT gradient of the AL stage cost (the GN
  Hessian is a model, but the gradient has no approximation);
* the affine family's Jacobian is truly constant (the build-time ``S_aff``
  matches autodiff at random points);
* its true cost matches the canonical ``MpcProblem.stage_objective``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem

from tests.conftest import config_path


def _problem(name, slack=False):
    setup = load_setup(config_path(name))
    if slack:
        setup.mpc.slack = True
    return MpcProblem(setup)


CASES = [
    ("pointRobotMpc.yaml", False),
    ("pointRobotMpc.yaml", True),  # slack-augmented variant
    ("pandaMpc.yaml", False),
    ("boxerMpc.yaml", False),
]


@pytest.mark.parametrize("cfg_name,slack", CASES)
def test_split_gradient_matches_autodiff(cfg_name, slack):
    problem = _problem(cfg_name, slack)
    solve = problem.build_solver()
    internals = solve._internals
    dims = problem.dims
    nx, nw = dims.nx, dims.ns + dims.nu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=nx) * 0.3, jnp.float32)
    w = jnp.asarray(np.abs(rng.normal(size=nw)) * 0.3, jnp.float32)
    p = jnp.asarray(np.abs(rng.normal(size=problem.npar)) * 0.5 + 0.1, jnp.float32)
    lam = jnp.asarray(np.abs(rng.normal(size=problem.n_con)), jnp.float32)
    mu = jnp.asarray(7.0, jnp.float32)

    g, H = internals["stage_expansion"](x, w, p, lam, mu)
    al = internals["al_stage_cost"]
    g_ref = jax.grad(lambda v: al(v[:nx], v[nx:], p, lam, mu))(
        jnp.concatenate([x, w])
    )
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-4)

    # Hessian model: symmetric and PSD by construction
    H = np.asarray(H)
    np.testing.assert_allclose(H, H.T, atol=1e-5)
    eigs = np.linalg.eigvalsh(H)
    assert eigs.min() >= -1e-4


@pytest.mark.parametrize("cfg_name,slack", CASES)
def test_affine_jacobian_constant(cfg_name, slack):
    problem = _problem(cfg_name, slack)
    split = problem.split_callbacks()
    rng = np.random.default_rng(1)
    for _ in range(3):
        z = jnp.asarray(rng.normal(size=problem.dims.nz), jnp.float32)
        p = jnp.asarray(rng.normal(size=problem.npar), jnp.float32)
        J = jax.jacfwd(lambda zz: split["aff_rows"](zz, p))(z)
        np.testing.assert_allclose(np.asarray(J), split["S_aff"], atol=1e-5)


@pytest.mark.parametrize("cfg_name,slack", CASES)
def test_split_true_cost_matches_stage_objective(cfg_name, slack):
    problem = _problem(cfg_name, slack)
    solve = problem.build_solver()
    dims = problem.dims
    rng = np.random.default_rng(2)
    z = jnp.asarray(np.abs(rng.normal(size=dims.nz)) * 0.4 + 0.05, jnp.float32)
    p = jnp.asarray(np.abs(rng.normal(size=problem.npar)) * 0.5 + 0.1, jnp.float32)
    c_split = solve._internals["true_cost"](z[: dims.nx], z[dims.nx :], p)
    c_ref = problem.stage_objective(z, p)
    np.testing.assert_allclose(float(c_split), float(c_ref), rtol=1e-5)


@pytest.mark.parametrize("cfg_name,slack", CASES)
def test_split_ineq_matches_config_order_set(cfg_name, slack):
    """The split constraint stack is a permutation of [module rows in config
    order; bound rows] — same multiset of values, reordered to
    [q-family; affine-family]."""
    problem = _problem(cfg_name, slack)
    solve = problem.build_solver()
    dims = problem.dims
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=dims.nz) * 0.3, jnp.float32)
    p = jnp.asarray(np.abs(rng.normal(size=problem.npar)) * 0.5 + 0.1, jnp.float32)

    c_split = np.asarray(solve._internals["stage_ineq"](z[: dims.nx], z[dims.nx :], p))

    mod = np.asarray(problem.stage_inequalities(z, p))
    rows = problem.bound_rows()
    zb = np.asarray(z)
    bound_vals = np.array([sign * (zb[i] - b) for i, sign, b in rows], np.float32)
    c_ref = np.concatenate([mod, bound_vals])
    np.testing.assert_allclose(np.sort(c_split), np.sort(c_ref), rtol=1e-5, atol=1e-5)

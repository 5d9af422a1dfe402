"""Batched (custom_vmap) rules == loop-of-unbatched calls (ADVICE r4).

The FK primitive (``models/fk.py`` ``_walk_scalar``) and the Gauss-Newton
assembly (``solver/al_ilqr.py`` ``gn_assemble``) carry hand-written
``jax.custom_batching.custom_vmap`` rules: under ``vmap`` they dispatch to
scalarized structure-of-arrays graphs instead of the per-lane form. A
regression there would only surface as a hard-to-diagnose solver parity
failure — these tests pin the batched outputs to a plain Python loop of
unbatched calls across the panda / boxer / pointRobot(+slack) configs.
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
    ("pointRobotMpc.yaml", True),
    ("pandaMpc.yaml", False),
    ("boxerMpc.yaml", False),
]

B = 12


@pytest.mark.parametrize("cfg_name,slack", CASES)
def test_fk_pos_links_vmap_matches_loop(cfg_name, slack):
    problem = _problem(cfg_name, slack)
    kin, links = problem.kin, list(problem.robot.collision_links)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1.4, 1.4, size=(B, problem.dims.n)), jnp.float32)
    batched = jax.vmap(lambda qq: kin.fk_pos_links(qq, links))(q)
    looped = jnp.stack([kin.fk_pos_links(q[i], links) for i in range(B)])
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(looped), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("cfg_name,slack", CASES)
def test_fk_jacobian_vmap_matches_loop(cfg_name, slack):
    problem = _problem(cfg_name, slack)
    kin = problem.kin
    end = problem.robot.end_link
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.uniform(-1.4, 1.4, size=(B, problem.dims.n)), jnp.float32)
    jac = lambda qq: jax.jacfwd(lambda v: kin.fk_pos(v, end))(qq)
    batched = jax.vmap(jac)(q)
    looped = jnp.stack([jac(q[i]) for i in range(B)])
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(looped), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("cfg_name,slack", CASES)
def test_stage_expansion_vmap_matches_loop(cfg_name, slack):
    problem = _problem(cfg_name, slack)
    solve = problem.build_solver()
    expansion = solve._internals["stage_expansion"]
    dims = problem.dims
    nx, nw = dims.nx, dims.ns + dims.nu

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, nx)) * 0.3, jnp.float32)
    w = jnp.asarray(np.abs(rng.normal(size=(B, nw))) * 0.3, jnp.float32)
    p = jnp.asarray(
        np.abs(rng.normal(size=(B, problem.npar))) * 0.5 + 0.1, jnp.float32
    )
    lam = jnp.asarray(np.abs(rng.normal(size=(B, problem.n_con))), jnp.float32)
    mu = jnp.asarray(7.0, jnp.float32)

    g_b, H_b = jax.vmap(expansion, in_axes=(0, 0, 0, 0, None))(x, w, p, lam, mu)
    g_l = jnp.stack([expansion(x[i], w[i], p[i], lam[i], mu)[0] for i in range(B)])
    H_l = jnp.stack([expansion(x[i], w[i], p[i], lam[i], mu)[1] for i in range(B)])
    np.testing.assert_allclose(
        np.asarray(g_b), np.asarray(g_l), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(H_b), np.asarray(H_l), rtol=2e-4, atol=2e-4
    )

"""Pallas fused Riccati sweep vs the lax.scan reference implementation.

Runs the Pallas kernel in interpreter mode (CPU) and checks gains match the
scan path on random well-conditioned LQR data, including the failed-lane
contract (non-positive pivot -> zero gains + failed flag).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_mpcs_tpu.config import SolverConfiguration
from robot_mpcs_tpu.solver.al_ilqr import StageFunctions, build_solver
from robot_mpcs_tpu.ops.riccati_pallas import riccati_backward_batched


def _random_lqr(B, N, nx, nw, seed=0):
    rng = np.random.default_rng(seed)
    lx = rng.normal(size=(B, N, nx)).astype(np.float32)
    lw = rng.normal(size=(B, N, nw)).astype(np.float32)

    def spd(n, scale):
        M = rng.normal(size=(B, N, n, n)).astype(np.float32)
        return scale * (M @ M.transpose(0, 1, 3, 2)) + np.eye(n, dtype=np.float32)

    lxx = spd(nx, 0.1)
    lww = spd(nw, 0.1)
    lxw = 0.1 * rng.normal(size=(B, N, nx, nw)).astype(np.float32)
    A = np.eye(nx, dtype=np.float32) + 0.05 * rng.normal(size=(B, N, nx, nx)).astype(
        np.float32
    )
    Bm = 0.1 * rng.normal(size=(B, N, nx, nw)).astype(np.float32)
    A[:, -1] = 0.0
    Bm[:, -1] = 0.0
    reg = np.full((B,), 1e-6, np.float32)
    return tuple(jnp.asarray(x) for x in (lx, lw, lxx, lxw, lww, A, Bm, reg))


def _scan_backward(nx, nw, N):
    """Reference backward extracted from a solver built with the scan path."""
    dyn = lambda x, u: x
    cost = lambda x, w, p: jnp.sum(x * x) + jnp.sum(w * w)
    ineq = lambda x, w, p: jnp.zeros((0,), x.dtype)
    cfg = SolverConfiguration(riccati_backend="scan")
    solve = build_solver(
        StageFunctions(dyn, cost, ineq),
        nx=nx,
        ns=0,
        nu=nw,
        N=N,
        n_con=0,
        w_lb=-np.inf,
        w_ub=np.inf,
        cfg=cfg,
    )
    return solve._internals["backward"]


@pytest.mark.parametrize("dims", [(6, 3, 5), (14, 7, 20)])
def test_pallas_matches_scan(dims):
    nx, nw, N = dims
    B = 4
    data = _random_lqr(B, N, nx, nw)
    backward = _scan_backward(nx, nw, N)
    k_ref, K_ref, failed_ref = jax.vmap(lambda *a: backward(*a))(*data)
    k_pal, K_pal, failed_pal = riccati_backward_batched(*data, N=N, nx=nx, nw=nw)
    assert not bool(np.asarray(failed_ref).any())
    assert not bool(np.asarray(failed_pal).any())
    np.testing.assert_allclose(
        np.asarray(k_pal), np.asarray(k_ref), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(K_pal), np.asarray(K_ref), rtol=2e-3, atol=2e-4
    )


def test_pallas_failed_lane_contract():
    nx, nw, N = 6, 3, 4
    B = 3
    data = list(_random_lqr(B, N, nx, nw, seed=1))
    # poison lane 1: make lww strongly negative definite so every pivot fails
    lww = np.asarray(data[4]).copy()
    lww[1] = -10.0 * np.eye(nw, dtype=np.float32)
    data[4] = jnp.asarray(lww)
    k, K, failed = riccati_backward_batched(*data, N=N, nx=nx, nw=nw)
    failed = np.asarray(failed)
    assert bool(failed[1]) and not bool(failed[0]) and not bool(failed[2])
    assert np.all(np.asarray(k)[1] == 0.0)
    assert np.all(np.asarray(K)[1] == 0.0)


def test_solver_auto_uses_pallas_only_on_tpu():
    # on the CPU test backend, 'auto' must select the scan path (no pallas
    # interpret overhead in production CPU fallbacks)
    assert jax.default_backend() == "cpu"
    cfg = SolverConfiguration()
    assert cfg.riccati_backend == "auto"

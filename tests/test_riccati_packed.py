"""Sublane-packed structured Riccati kernel vs the lax.scan reference.

Runs the packed kernel in interpreter mode (CPU) against the scan path on
random data with the exact holonomic dynamics structure it specializes for
(A = [[I, aI],[0, I]], B = [[b1 I],[b2 I]]), including the failed-lane
contract and the build-time structure detector.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_mpcs_tpu.config import SolverConfiguration
from robot_mpcs_tpu.ops.riccati_packed import detect_structure, riccati_backward_packed
from robot_mpcs_tpu.solver.al_ilqr import StageFunctions, build_solver


def _structured_dyn(n, ns, a, b1, b2):
    nx = 2 * n
    A = np.block(
        [[np.eye(n), a * np.eye(n)], [np.zeros((n, n)), np.eye(n)]]
    ).astype(np.float32)
    Bm = np.concatenate(
        [
            np.zeros((nx, ns), np.float32),
            np.block([[b1 * np.eye(n)], [b2 * np.eye(n)]]).astype(np.float32),
        ],
        axis=1,
    )
    return A, Bm


def _random_data(B, N, nx, nw, seed=0):
    rng = np.random.default_rng(seed)

    def spd(sz, scale):
        M = rng.normal(size=(B, N, sz, sz)).astype(np.float32)
        return scale * (M @ M.transpose(0, 1, 3, 2)) + np.eye(sz, dtype=np.float32)

    lx = rng.normal(size=(B, N, nx)).astype(np.float32)
    lw = rng.normal(size=(B, N, nw)).astype(np.float32)
    lxx, lww = spd(nx, 0.1), spd(nw, 0.1)
    lxw = 0.1 * rng.normal(size=(B, N, nx, nw)).astype(np.float32)
    reg = np.full((B,), 1e-6, np.float32)
    return lx, lw, lxx, lxw, lww, reg


def _scan_backward(nx, nw, ns, N):
    cfg = SolverConfiguration(riccati_backend="scan")
    solve = build_solver(
        StageFunctions(
            lambda x, u: x,
            lambda x, w, p: jnp.sum(x * x),
            lambda x, w, p: jnp.zeros((0,), x.dtype),
        ),
        nx=nx, ns=ns, nu=nw - ns, N=N, n_con=0,
        w_lb=-np.inf, w_ub=np.inf, cfg=cfg,
    )
    return solve._internals["backward"]


@pytest.mark.parametrize("dims", [(3, 0, 6), (7, 0, 20), (3, 1, 5)])
def test_packed_matches_scan(dims):
    n, ns, N = dims
    nx, nw = 2 * n, ns + n
    B = 5
    a, b1, b2 = np.float32(0.05), np.float32(0.00125), np.float32(0.05)
    A, Bm = _structured_dyn(n, ns, a, b1, b2)
    st = detect_structure(A, Bm, nx=nx, ns=ns)
    assert st is not None
    lx, lw, lxx, lxw, lww, reg = _random_data(B, N, nx, nw)

    Af = np.broadcast_to(A, (B, N, nx, nx)).copy()
    Bf = np.broadcast_to(Bm, (B, N, nx, nw)).copy()
    Af[:, -1] = 0.0
    Bf[:, -1] = 0.0
    backward = _scan_backward(nx, nw, ns, N)
    k_ref, K_ref, f_ref = jax.vmap(lambda *z: backward(*z))(
        *map(jnp.asarray, (lx, lw, lxx, lxw, lww, Af, Bf, reg))
    )
    k_p, K_p, f_p = riccati_backward_packed(
        *map(jnp.asarray, (lx, lw, lxx, lxw, lww, reg)),
        N=N, nx=nx, nw=nw, ns=ns, a=st[0], b1=st[1], b2=st[2],
    )
    assert not bool(np.asarray(f_ref).any())
    assert not bool(np.asarray(f_p).any())
    np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_ref), rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_ref), rtol=2e-3, atol=2e-5)


def test_packed_failed_lane_contract():
    n, ns, N, B = 3, 0, 4, 4
    nx, nw = 2 * n, n
    lx, lw, lxx, lxw, lww, reg = _random_data(B, N, nx, nw, seed=3)
    lxx[2, 1] = np.nan  # poison one lane mid-horizon
    k, K, failed = riccati_backward_packed(
        *map(jnp.asarray, (lx, lw, lxx, lxw, lww, reg)),
        N=N, nx=nx, nw=nw, ns=ns, a=0.1, b1=0.005, b2=0.1,
    )
    assert np.asarray(failed).tolist() == [False, False, True, False]
    # healthy lanes unaffected and finite
    assert np.isfinite(np.asarray(k)[[0, 1, 3]]).all()


def test_detect_structure_rejects_non_structured():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(6, 6)).astype(np.float32)
    B = rng.normal(size=(6, 3)).astype(np.float32)
    assert detect_structure(A, B, nx=6, ns=0) is None
    # odd state dim cannot be [[I, aI],[0, I]]
    assert detect_structure(np.eye(5), np.zeros((5, 2)), nx=5, ns=0) is None

"""Unrolled tiny-Cholesky solve vs the LAPACK reference (ops/linalg_small)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_mpcs_tpu.ops.linalg_small import chol_solve_unrolled


@pytest.mark.parametrize("n,m", [(1, 1), (3, 4), (7, 15), (17, 18)])
def test_matches_lapack(n, m):
    rng = np.random.default_rng(n * 100 + m)
    A = rng.standard_normal((n, n))
    Q = A @ A.T + n * np.eye(n)
    rhs = rng.standard_normal((n, m))
    X, bad = chol_solve_unrolled(jnp.asarray(Q, jnp.float32), jnp.asarray(rhs, jnp.float32))
    assert not bool(bad)
    ref = np.linalg.solve(Q, rhs)
    np.testing.assert_allclose(np.asarray(X), ref, rtol=2e-4, atol=2e-4)


def test_non_psd_flags_bad():
    Q = jnp.asarray([[1.0, 0.0], [0.0, -1.0]])
    _, bad = chol_solve_unrolled(Q, jnp.ones((2, 1)))
    assert bool(bad)


def test_nonfinite_flags_bad():
    Q = jnp.asarray([[jnp.nan, 0.0], [0.0, 1.0]])
    _, bad = chol_solve_unrolled(Q, jnp.ones((2, 1)))
    assert bool(bad)


def test_vmaps():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((8, 5, 5)).astype(np.float32)
    Q = A @ np.swapaxes(A, 1, 2) + 5 * np.eye(5, dtype=np.float32)
    rhs = rng.standard_normal((8, 5, 3)).astype(np.float32)
    X, bad = jax.vmap(chol_solve_unrolled)(jnp.asarray(Q), jnp.asarray(rhs))
    ref = np.linalg.solve(Q, rhs)
    np.testing.assert_allclose(np.asarray(X), ref, rtol=2e-4, atol=2e-4)
    assert not np.any(np.asarray(bad))

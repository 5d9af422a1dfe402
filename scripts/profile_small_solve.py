"""Microbench: ways to solve batched tiny SPD systems (nw x nw) on TPU.

The Riccati sweep needs Qww^{-1} @ [qw | Qxw^T] per stage. Candidates:
  chol   — jnp.linalg.cholesky + cho_solve (current)
  lu     — jnp.linalg.solve
  schur  — block-recursive SPD inverse (pure batched matmuls, MXU-friendly)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B = int(os.environ.get("B", "81920"))
nw, nx = 7, 14

rng = np.random.default_rng(0)
M = rng.normal(size=(B, nw, nw)).astype(np.float32)
Q = jnp.asarray(M @ M.transpose(0, 2, 1) + 0.5 * np.eye(nw, dtype=np.float32))
R = jnp.asarray(rng.normal(size=(B, nw, nx + 1)).astype(np.float32))


def spd_inv(A):
    """Recursive SPD inverse via Schur complements; batched matmuls only."""
    n = A.shape[-1]
    if n == 1:
        return 1.0 / A
    k = n // 2
    A11, A12 = A[..., :k, :k], A[..., :k, k:]
    A22 = A[..., k:, k:]
    I11 = spd_inv(A11)
    S = A22 - jnp.swapaxes(A12, -1, -2) @ I11 @ A12  # Schur complement
    IS = spd_inv(S)
    T = I11 @ A12  # (k, n-k)
    top_left = I11 + T @ IS @ jnp.swapaxes(T, -1, -2)
    top_right = -T @ IS
    bot_left = jnp.swapaxes(top_right, -1, -2)
    return jnp.concatenate(
        [
            jnp.concatenate([top_left, top_right], axis=-1),
            jnp.concatenate([bot_left, IS], axis=-1),
        ],
        axis=-2,
    )


def chol(Q, R):
    L = jnp.linalg.cholesky(Q)
    return jax.scipy.linalg.cho_solve((L, True), R)


def lu(Q, R):
    return jnp.linalg.solve(Q, R)


def schur(Q, R):
    return spd_inv(Q) @ R


for name, f in (("chol", chol), ("lu", lu), ("schur", schur)):
    g = jax.jit(f)
    out = g(Q, R)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = g(Q, R)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    # accuracy vs float64 numpy
    ref = np.linalg.solve(np.asarray(Q, np.float64), np.asarray(R, np.float64))
    err = float(np.max(np.abs(np.asarray(out) - ref)) / np.max(np.abs(ref)))
    print(f"{name}: {dt*1000:8.2f} ms   rel_err={err:.2e}", flush=True)

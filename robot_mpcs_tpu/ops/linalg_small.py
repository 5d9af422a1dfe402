"""Unrolled dense linear algebra for tiny static-shape matrices.

The Riccati backward sweep factorizes an ``nw x nw`` SPD matrix per stage
with ``nw <= ~17`` for every built-in robot. ``jnp.linalg.cholesky`` /
``cho_solve`` lower to LAPACK FFI custom calls on CPU — which (a) cannot be
serialized portably into AOT artifacts (deserialized LAPACK custom calls
segfault in a fresh process on the pinned jaxlib) and (b) carry custom-call
overhead absurd for a 7x7 system. This module unrolls the factorization and
substitutions over the STATIC dimension into plain scalar jnp ops: the
whole solve fuses into elementwise code on any backend, vmaps into batched
scalars (the same structure-of-arrays trick as ``models/fk.py``), and
serializes as pure StableHLO.

Numerics match ``cho_solve((cholesky(Q), True), rhs)`` up to fp reordering;
a non-PSD input produces NaNs exactly like the LAPACK path (callers detect
via ``isnan``).
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_solve_unrolled(Q, rhs):
    """Solve ``Q @ X = rhs`` for SPD ``Q`` via unrolled Cholesky.

    ``Q``: (n, n) with static n; ``rhs``: (n, m). Returns ``(X, bad)``
    where ``bad`` is a scalar bool — True when the factorization failed
    (non-positive pivot / non-finite input). On failure X contains NaNs;
    callers mask on ``bad``.
    """
    n = Q.shape[0]
    if rhs.shape[0] != n:
        raise ValueError(f"rhs rows {rhs.shape[0]} != n {n}")
    # Cholesky: L[i][j] scalars, unrolled over the static dimension
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    diag = []
    for j in range(n):
        s = Q[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        diag.append(s)
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, n):
            t = Q[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_d[j]
    bad = ~jnp.all(
        jnp.isfinite(jnp.stack(diag)) & (jnp.stack(diag) > 0.0)
    )
    # forward substitution: L Y = rhs (Y rows are (m,) vectors)
    Y = [None] * n
    for i in range(n):
        acc = rhs[i]
        for k in range(i):
            acc = acc - L[i][k] * Y[k]
        Y[i] = acc * inv_d[i]
    # back substitution: L^T X = Y
    X = [None] * n
    for i in reversed(range(n)):
        acc = Y[i]
        for k in range(i + 1, n):
            acc = acc - L[k][i] * X[k]
        X[i] = acc * inv_d[i]
    return jnp.stack(X, axis=0), bad

"""Fused batched Riccati backward sweep as a Pallas TPU kernel.

Why: the solver's backward pass is a ``lax.scan`` over N stages of tiny
(nx<=16) matrix algebra. Under ``vmap`` XLA executes each scan step as
batched small-matrix ops whose (14, 14) trailing dims pad onto (8, 128)
tiles — ~10% memory utilization — and every step round-trips the stage
tensors through HBM. This kernel flips the layout: the **batch is the lane
dimension** and the tiny matrix dims are unrolled sublane rows, so every
vector op is dense, and the whole N-stage recursion for a block of lanes
runs out of VMEM with one HBM read of the inputs and one write of the
gains.

Replaces (speed-of-light version of) the factorization inside the
ForcesPro-generated interior-point solver the reference calls per scenario
(reference ``robotmpcs/planner/mpcPlanner.py:262``).

Layout: every per-stage tensor is passed batch-last, e.g. ``lxx`` is
``(N, nx, nx, B)``; a block processes ``BLK`` lanes of the batch.

The SPD stage system ``Qww`` is solved with an unrolled LDL^T factorization
(no sqrt, no XLA cholesky loop); a non-positive pivot marks the lane failed
(zero gains emitted — the iteration-level regularization escalation retries,
same contract as the scan path in ``al_ilqr.backward``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # lanes per block = one VPU lane tile (min for pallas TPU blocks)
_PIVOT_TINY = 1e-12


def _row(X: jnp.ndarray, i: int, axis: int) -> jnp.ndarray:
    """Static single-index slice with the axis kept (Mosaic-safe: plain
    integer indexing lowers through an unsupported >2D gather)."""
    return lax.slice_in_dim(X, i, i + 1, axis=axis)


def _bmm(X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
    """Batch-last matmul: (m, k, BLK) x (k, n, BLK) -> (m, n, BLK).

    Accumulated over k with (m, n, BLK) partials — a single broadcast
    product would materialize an (m, k, n, BLK) temp and blow the VMEM
    budget at nx = 14."""
    k = X.shape[1]
    acc = _row(X, 0, 1) * _row(Y, 0, 0)
    for j in range(1, k):
        acc = acc + _row(X, j, 1) * _row(Y, j, 0)
    return acc


def _bmv(X: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batch-last matvec: (m, k, BLK) x (k, BLK) -> (m, BLK)."""
    return jnp.sum(X * v[None, :, :], axis=1)


def _bT(X: jnp.ndarray) -> jnp.ndarray:
    """Batch-last transpose: (m, n, BLK) -> (n, m, BLK)."""
    return jnp.swapaxes(X, 0, 1)


def _ldl_solve(Q: jnp.ndarray, R: jnp.ndarray, nw: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve SPD ``Q x = R`` per lane via unrolled LDL^T.

    Q: (nw, nw, BLK), R: (nw, m, BLK). Returns (x, bad) with x (nw, m, BLK)
    and bad (BLK,) f32 mask (1.0 on lanes whose factorization hit a
    non-positive pivot).
    """
    BLKd = Q.shape[-1]

    def q_at(i, j):  # (1, BLK) "per-lane scalar" row
        return lax.slice(Q, (i, j, 0), (i + 1, j + 1, BLKd)).reshape(1, BLKd)

    # factor: Q = L D L^T with unit lower-triangular L, diagonal D;
    # every entry is a (1, BLK) lane vector
    L = [[None] * nw for _ in range(nw)]
    D = [None] * nw
    # failure mask kept as f32 (Mosaic rejects 1-D bool loop carries)
    bad = jnp.zeros((1, BLKd), dtype=jnp.float32)
    for j in range(nw):
        d = q_at(j, j)
        for k in range(j):
            d = d - L[j][k] * L[j][k] * D[k]
        # NaN-aware: (d > tiny) is False for NaN pivots, so NaN inputs mark
        # the lane failed (same contract as the scan path's isnan check)
        is_bad = 1.0 - (d > _PIVOT_TINY).astype(jnp.float32)
        bad = jnp.maximum(bad, is_bad)
        d = d * (1.0 - is_bad) + is_bad
        D[j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, nw):
            s = q_at(i, j)
            for k in range(j):
                s = s - L[i][k] * L[j][k] * D[k]
            L[i][j] = s * inv_d
    # forward substitution L y = R   (rows are (m, BLK) tiles)
    m = R.shape[1]
    r_at = lambda i: _row(R, i, 0).reshape(m, BLKd)
    y = [None] * nw
    for i in range(nw):
        acc = r_at(i)
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc
    # diagonal + back substitution L^T x = D^{-1} y
    x = [None] * nw
    for i in reversed(range(nw)):
        acc = y[i] / D[i]
        for k in range(i + 1, nw):
            acc = acc - L[k][i] * x[k]
        x[i] = acc
    return jnp.stack(x), bad.reshape(BLKd)


def _make_kernel(N: int, nx: int, nw: int):
    def kernel(
        lx_ref, lw_ref, lxx_ref, lxw_ref, lww_ref, A_ref, B_ref, reg_ref,
        kff_ref, K_ref, failed_ref,
    ):
        reg = reg_ref[pl.ds(0, 1)].reshape(BLK)
        eye_w = jnp.eye(nw, dtype=jnp.float32)[:, :, None]

        def at(ref, k):
            # dynamic single-stage read: ref[k] with a traced k would lower
            # to an unsupported >2D gather; pl.ds keeps it a dynamic slice
            v = ref[pl.ds(k, 1)]
            return v.reshape(v.shape[1:])

        def body(i, carry):
            vx, Vxx, failed = carry
            k = N - 1 - i
            # batch-constant dynamics come in with lane dim 1; broadcast to
            # the full lane tile here (lane-only broadcast — Mosaic cannot
            # broadcast sublanes and lanes in one op)
            A = at(A_ref, k)  # (nx, nx, BLK) or (nx, nx, 1)
            Bm = at(B_ref, k)  # (nx, nw, BLK) or (nx, nw, 1)
            if A.shape[-1] == 1:
                A = jnp.broadcast_to(A, A.shape[:-1] + (BLK,))
            if Bm.shape[-1] == 1:
                Bm = jnp.broadcast_to(Bm, Bm.shape[:-1] + (BLK,))
            At = _bT(A)
            T = _bmm(Vxx, A)  # Vxx A
            U = _bmm(Vxx, Bm)  # Vxx B
            Qxx = at(lxx_ref, k) + _bmm(At, T)
            Qxw = at(lxw_ref, k) + _bmm(At, U)
            Qww = at(lww_ref, k) + _bmm(_bT(Bm), U) + eye_w * reg[None, None, :]
            qx = at(lx_ref, k) + _bmv(At, vx)
            qw = at(lw_ref, k) + _bmv(_bT(Bm), vx)

            # one LDL^T solve for both the feedforward and the gain:
            # rhs = [qw | Qxw^T] -> (nw, 1 + nx, BLK)
            rhs = jnp.concatenate([qw.reshape(nw, 1, BLK), _bT(Qxw)], axis=1)
            sol, bad = _ldl_solve(Qww, rhs, nw)
            sol = -sol * (1.0 - bad)[None, None, :]
            k_ff = _row(sol, 0, 1).reshape(nw, BLK)
            K = lax.slice_in_dim(sol, 1, 1 + nx, axis=1)  # (nw, nx, BLK)
            Kt = _bT(K)

            Qww_kff = _bmv(Qww, k_ff)
            vx_new = qx + _bmv(Qxw, k_ff) + _bmv(Kt, qw) + _bmv(Kt, Qww_kff)
            QxwK = _bmm(Qxw, K)
            Vxx_new = Qxx + QxwK + _bT(QxwK) + _bmm(Kt, _bmm(Qww, K))
            Vxx_new = 0.5 * (Vxx_new + _bT(Vxx_new))

            kff_ref[pl.ds(k, 1)] = k_ff.reshape(1, nw, BLK)
            K_ref[pl.ds(k, 1)] = K.reshape(1, nw, nx, BLK)
            return vx_new, Vxx_new, jnp.maximum(failed, bad)

        init = (
            jnp.zeros((nx, BLK), jnp.float32),
            jnp.zeros((nx, nx, BLK), jnp.float32),
            jnp.zeros((BLK,), jnp.float32),
        )
        _, _, failed = lax.fori_loop(0, N, body, init)
        failed_ref[0] = failed

    return kernel


@functools.partial(jax.jit, static_argnames=("N", "nx", "nw"))
def riccati_backward_batched(lx, lw, lxx, lxw, lww, A, Bm, reg, *, N, nx, nw):
    """Batched Riccati sweep. Inputs are batch-FIRST (B, N, ...); reg (B,).

    ``A``/``Bm`` may be UNBATCHED ``(N, nx, nx)`` / ``(N, nx, nw)`` when the
    dynamics Jacobians are constant across the batch (linear holonomic
    models) — they then enter the kernel with a broadcast lane dim of 1,
    which keeps ~6 MB of double-buffered VMEM and ~100 MB of HBM broadcast
    materialization out of the hot loop.

    Returns (k_ff (B, N, nw), K (B, N, nw, nx), failed (B,) bool).
    """
    B = lx.shape[0]
    Bp = pl.cdiv(B, BLK) * BLK
    pad = Bp - B
    in_dtype = lx.dtype  # kernel computes in f32; cast back on the way out

    def prep(x):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        return jnp.moveaxis(x, 0, -1)  # batch-last

    def prep_dyn(x):
        x = x.astype(jnp.float32)
        if x.ndim == 3:  # constant across the batch: lane dim 1
            return x[..., None]
        return prep(x)

    args = [prep(x) for x in (lx, lw, lxx, lxw, lww)]
    args += [prep_dyn(A), prep_dyn(Bm)]
    reg_p = reg.astype(jnp.float32)
    if pad:
        reg_p = jnp.pad(reg_p, (0, pad))
    args.append(reg_p[None, :])  # (1, Bp)

    grid = (Bp // BLK,)

    def spec(shape):
        # batch-last block: full leading dims, BLK lanes (lane dim of 1 =
        # batch-constant operand, replicated to every block)
        nd = len(shape)
        blk = BLK if shape[-1] != 1 else 1
        return pl.BlockSpec(
            shape[:-1] + (blk,),
            (lambda *g: tuple([0] * (nd - 1)) + (g[0] if blk == BLK else 0,)),
            memory_space=pltpu.VMEM,
        )

    in_specs = [spec(a.shape) for a in args]
    out_shape = [
        jax.ShapeDtypeStruct((N, nw, Bp), jnp.float32),
        jax.ShapeDtypeStruct((N, nw, nx, Bp), jnp.float32),
        jax.ShapeDtypeStruct((1, Bp), jnp.float32),
    ]
    out_specs = [
        spec((N, nw, Bp)),
        spec((N, nw, nx, Bp)),
        spec((1, Bp)),
    ]
    kff, K, failed = pl.pallas_call(
        _make_kernel(N, nx, nw),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(*args)
    kff = jnp.moveaxis(kff, -1, 0)[:B].astype(in_dtype)
    K = jnp.moveaxis(K, -1, 0)[:B].astype(in_dtype)
    failed = failed[0, :B] > 0.5
    return kff, K, failed

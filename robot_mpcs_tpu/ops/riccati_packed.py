"""Sublane-packed Riccati backward sweep for structured (holonomic) dynamics.

The speed-of-light version of the solver's backward pass for the flagship
problem family. Three ideas compound:

1. **Full-tile batch packing.** The VPU's native tile is (8, 128); the
   existing general kernel (``riccati_pallas.py``) keeps the batch on the
   128 lanes only, so every per-matrix-entry operation moves (m, n, 128)
   arrays whose sublane dimension is the tiny matrix dim — m*n/8-of-8
   utilization plus Mosaic relayouts for the broadcasts. Here one block
   packs **1024 scenarios as a full (8, 128) tile per matrix entry**; every
   operation in the recursion is a dense full-tile FMA with zero
   broadcasts and zero relayouts.

2. **Stage-pipelined grid.** The grid is ``(batch_blocks, N)`` with the
   stage as the innermost (sequential) dimension, mapped in reverse. The
   Riccati carry (Vxx, vx) lives in VMEM scratch across grid steps while
   Pallas double-buffers the per-stage HBM loads behind the compute — the
   whole sweep streams through HBM exactly once.

3. **Structured dynamics.** Holonomic robots have the exact discrete-time
   form ``A = [[I, a I], [0, I]]``, ``B = [[b1 E], [b2 E]]`` (double
   integrator under any explicit RK scheme; ``models/dynamics.py``). The
   caller verifies this numerically at build time and passes the three
   scalars; all ``A``/``B`` products in the sweep collapse from O(nx^3) to
   O(nx^2) tile ops. The terminal stage's A = B = 0 convention
   (``al_ilqr.ilqr`` zeroes stage N-1) is equivalent to a zero incoming
   value function, which is how this kernel implements it.

The emitted gains use the Schur-complement identities
``vx' = qx + Qxw k_ff`` and ``Vxx' = Qxx + Qxw K`` (exact because
``k_ff = -Qww^{-1} qw`` and ``K = -Qww^{-1} Qxw^T``), saving the
K^T-quadratic terms the generic scan path evaluates.

Contract matches ``al_ilqr.backward`` / ``riccati_pallas``: a non-positive
LDL^T pivot (or NaN) marks the lane failed and emits zero gains for that
stage; the iteration-level regularization escalation retries.

Replaces the stage factorization inside the ForcesPro-generated solver the
reference calls per scenario (reference ``robotmpcs/planner/mpcPlanner.py:262``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
PACK = SUB * LANE  # scenarios per block: one full f32 VPU tile per entry
_PIVOT_TINY = 1e-12


def detect_structure(
    A, B, *, nx: int, ns: int, tol: float = 1e-6
) -> Optional[Tuple[float, float, float]]:
    """Return (a, b1, b2) if (A, B) have the holonomic block structure
    ``A = [[I, a I], [0, I]]``, ``B = [[0 | b1 I], [0 | b2 I]]`` (the first
    ``ns`` columns of B are the zero slack columns); else None."""
    import numpy as np

    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    if nx % 2 or A.shape != (nx, nx):
        return None
    n = nx // 2
    if B.shape != (nx, ns + n):
        return None
    a = float(A[0, n])
    b1 = float(B[0, ns])
    b2 = float(B[n, ns])
    eye = np.eye(n)
    ok = (
        np.abs(A[:n, :n] - eye).max() < tol
        and np.abs(A[n:, n:] - eye).max() < tol
        and np.abs(A[n:, :n]).max() < tol
        and np.abs(A[:n, n:] - a * eye).max() < tol
        and (ns == 0 or np.abs(B[:, :ns]).max() < tol)
        and np.abs(B[:n, ns:] - b1 * eye).max() < tol
        and np.abs(B[n:, ns:] - b2 * eye).max() < tol
    )
    return (a, b1, b2) if ok else None


def _make_kernel(N: int, nx: int, nw: int, ns: int, a: float, b1: float, b2: float):
    n = nx // 2
    nu = nw - ns
    m = 1 + nx  # rhs columns of the stage solve: [qw | Qxw^T]

    def kernel(
        lx_ref, lw_ref, lxx_ref, lxw_ref, lww_ref, reg_ref,
        kff_ref, K_ref, failed_ref,
        vx_s, vxx_s,
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            # terminal stage: zero incoming value function (== the scan
            # path's A = B = 0 at stage N-1)
            vxx_s[...] = jnp.zeros((nx * nx, SUB, LANE), jnp.float32)
            vx_s[...] = jnp.zeros((nx, SUB, LANE), jnp.float32)
            failed_ref[...] = jnp.zeros((1, 1, SUB, LANE), jnp.float32)

        reg = reg_ref[0, 0]  # (8, 128) per-lane regularization

        # ---- tile accessors (every entry is one (8, 128) tile) ----------
        V = [[vxx_s[i * nx + c] for c in range(nx)] for i in range(nx)]
        vx = [vx_s[i] for i in range(nx)]
        LXX = lambda i, c: lxx_ref[0, 0, i * nx + c]
        LXW = lambda i, c: lxw_ref[0, 0, i * nw + c]
        LWW = lambda i, c: lww_ref[0, 0, i * nw + c]

        # ---- structured products (A = [[I, aI],[0, I]], B = [[b1E],[b2E]])
        # T = Vxx A:   T[:, c] = V[:, c];  T[:, n+c] = a V[:, c] + V[:, n+c]
        T = [[None] * nx for _ in range(nx)]
        for i in range(nx):
            for c in range(n):
                T[i][c] = V[i][c]
                T[i][n + c] = a * V[i][c] + V[i][n + c]
        # Qxx = lxx + A^T T: row i -> T[i]; row n+i -> a T[i] + T[n+i]
        Qxx = [[None] * nx for _ in range(nx)]
        for i in range(n):
            for c in range(nx):
                Qxx[i][c] = LXX(i, c) + T[i][c]
                Qxx[n + i][c] = LXX(n + i, c) + a * T[i][c] + T[n + i][c]
        # U = Vxx B: U[:, ns+c] = b1 V[:, c] + b2 V[:, n+c]; slack cols 0
        U = [[None] * nu for _ in range(nx)]
        for i in range(nx):
            for c in range(nu):
                U[i][c] = b1 * V[i][c] + b2 * V[i][n + c]
        # Qxw = lxw + A^T U (slack cols: lxw only)
        Qxw = [[None] * nw for _ in range(nx)]
        for i in range(n):
            for c in range(ns):
                Qxw[i][c] = LXW(i, c)
                Qxw[n + i][c] = LXW(n + i, c)
            for c in range(nu):
                Qxw[i][ns + c] = LXW(i, ns + c) + U[i][c]
                Qxw[n + i][ns + c] = LXW(n + i, ns + c) + a * U[i][c] + U[n + i][c]
        # Qww = lww + B^T U + reg I (slack rows/cols: lww only)
        Qww = [[None] * nw for _ in range(nw)]
        for i in range(nw):
            for c in range(nw):
                Qww[i][c] = LWW(i, c)
        for i in range(nu):
            for c in range(nu):
                Qww[ns + i][ns + c] = Qww[ns + i][ns + c] + (
                    b1 * U[i][c] + b2 * U[n + i][c]
                )
        for i in range(nw):
            Qww[i][i] = Qww[i][i] + reg
        # qx = lx + A^T vx;  qw = lw + B^T vx
        qx = [None] * nx
        for i in range(n):
            qx[i] = lx_ref[0, 0, i] + vx[i]
            qx[n + i] = lx_ref[0, 0, n + i] + a * vx[i] + vx[n + i]
        qw = [lw_ref[0, 0, i] for i in range(nw)]
        for c in range(nu):
            qw[ns + c] = qw[ns + c] + b1 * vx[c] + b2 * vx[n + c]

        # ---- LDL^T factor + solve, rhs = [qw | Qxw^T] --------------------
        L = [[None] * nw for _ in range(nw)]
        D = [None] * nw
        Dinv = [None] * nw
        bad = jnp.zeros((SUB, LANE), jnp.float32)
        for jj in range(nw):
            d = Qww[jj][jj]
            for k in range(jj):
                d = d - L[jj][k] * L[jj][k] * D[k]
            # NaN-aware: (d > tiny) is False for NaN, marking the lane failed
            is_bad = 1.0 - (d > _PIVOT_TINY).astype(jnp.float32)
            bad = jnp.maximum(bad, is_bad)
            d = d * (1.0 - is_bad) + is_bad
            D[jj] = d
            Dinv[jj] = 1.0 / d
            for i in range(jj + 1, nw):
                s = Qww[i][jj]
                for k in range(jj):
                    s = s - L[i][k] * L[jj][k] * D[k]
                L[i][jj] = s * Dinv[jj]
        # rhs column c: c == 0 -> qw; c == 1+r -> Qxw[r][:]
        rhs = lambda i, c: qw[i] if c == 0 else Qxw[c - 1][i]
        Y = [[None] * m for _ in range(nw)]
        for i in range(nw):
            for c in range(m):
                acc = rhs(i, c)
                for k in range(i):
                    acc = acc - L[i][k] * Y[k][c]
                Y[i][c] = acc
        X = [[None] * m for _ in range(nw)]
        for i in reversed(range(nw)):
            for c in range(m):
                acc = Y[i][c] * Dinv[i]
                for k in range(i + 1, nw):
                    acc = acc - L[k][i] * X[k][c]
                X[i][c] = acc

        good = 1.0 - bad  # failed lanes emit zero gains for this stage
        k_ff = [-X[i][0] * good for i in range(nw)]
        K = [[-X[i][1 + c] * good for c in range(nx)] for i in range(nw)]

        # ---- value function update (Schur-complement form) ---------------
        # vx' = qx + Qxw k_ff ;  Vxx' = Qxx + Qxw K  (exact: Qww k = -qw,
        # Qww K = -Qxw^T make the K^T-quadratic terms cancel)
        for i in range(nx):
            acc = qx[i]
            for w in range(nw):
                acc = acc + Qxw[i][w] * k_ff[w]
            vx_s[i] = acc
        # symmetric: compute the upper triangle, mirror the rest
        for i in range(nx):
            for c in range(i, nx):
                acc = Qxx[i][c]
                for w in range(nw):
                    acc = acc + Qxw[i][w] * K[w][c]
                vxx_s[i * nx + c] = acc
                if c != i:
                    vxx_s[c * nx + i] = acc

        # ---- emit --------------------------------------------------------
        for i in range(nw):
            kff_ref[0, 0, i] = k_ff[i]
            for c in range(nx):
                K_ref[0, 0, i * nx + c] = K[i][c]
        failed_ref[0, 0] = jnp.maximum(failed_ref[0, 0], bad)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("N", "nx", "nw", "ns", "a", "b1", "b2")
)
def riccati_backward_packed(
    lx, lw, lxx, lxw, lww, reg, *, N, nx, nw, ns, a, b1, b2
):
    """Batched structured Riccati sweep. Inputs batch-first: lx (B, N, nx),
    lw (B, N, nw), lxx (B, N, nx, nx), lxw (B, N, nx, nw), lww (B, N, nw, nw),
    reg (B,). Returns (k_ff (B, N, nw), K (B, N, nw, nx), failed (B,) bool).
    """
    B = lx.shape[0]
    nb = pl.cdiv(B, PACK)
    Bp = nb * PACK
    pad = Bp - B
    in_dtype = lx.dtype

    def prep(x):
        x = x.astype(jnp.float32).reshape(B, N, -1)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        R = x.shape[-1]
        # (Bp, N, R) -> (nb, SUB, LANE, N, R) -> (nb, N, R, SUB, LANE)
        return x.reshape(nb, SUB, LANE, N, R).transpose(0, 3, 4, 1, 2)

    args = [prep(x) for x in (lx, lw, lxx, lxw, lww)]
    reg_p = reg.astype(jnp.float32)
    if pad:
        reg_p = jnp.pad(reg_p, (0, pad))
    args.append(reg_p.reshape(nb, SUB, LANE)[:, None])  # (nb, 1, SUB, LANE)

    grid = (nb, N)

    def stage_spec(R):
        return pl.BlockSpec(
            (1, 1, R, SUB, LANE),
            lambda i, j: (i, N - 1 - j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    blk_spec = pl.BlockSpec(  # per-block constants / accumulators
        (1, 1, SUB, LANE), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        stage_spec(nx),
        stage_spec(nw),
        stage_spec(nx * nx),
        stage_spec(nx * nw),
        stage_spec(nw * nw),
        blk_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, N, nw, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((nb, N, nw * nx, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, SUB, LANE), jnp.float32),
    ]
    out_specs = [stage_spec(nw), stage_spec(nw * nx), blk_spec]

    kff, K, failed = pl.pallas_call(
        _make_kernel(N, nx, nw, ns, a, b1, b2),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nx, SUB, LANE), jnp.float32),       # vx carry
            pltpu.VMEM((nx * nx, SUB, LANE), jnp.float32),  # Vxx carry
        ],
        interpret=jax.default_backend() == "cpu",
    )(*args)

    def unprep(x, trailing):
        # (nb, N, R, SUB, LANE) -> (Bp, N, R) -> (B, N, *trailing)
        R = x.shape[2]
        x = x.transpose(0, 3, 4, 1, 2).reshape(Bp, N, R)
        return x[:B].reshape((B, N) + trailing).astype(in_dtype)

    kff = unprep(kff, (nw,))
    K = unprep(K, (nw, nx))
    failed = failed.transpose(0, 2, 3, 1).reshape(Bp)[:B] > 0.5
    return kff, K, failed

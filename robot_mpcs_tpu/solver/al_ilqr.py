"""Batched augmented-Lagrangian iLQR — the TPU-native NLP solver core.

This replaces the ForcesPro-generated interior-point C solver the reference
drives (reference ``robotmpcs/models/mpcModel.py:74-129`` builds the problem,
``robotmpcs/planner/mpcPlanner.py:262`` calls ``solver.solve``). Design:

* **Equality structure (stage dynamics)** is eliminated by a Riccati backward
  sweep over the horizon — the same block-tridiagonal KKT factorization an
  interior-point stage solver performs. Unbatched it is a ``lax.scan``;
  under ``vmap`` on TPU it dispatches (via ``jax.custom_batching``) to the
  fused Pallas kernel in ``robot_mpcs_tpu/ops/riccati_pallas.py``.
* **Inequalities + variable bounds** are handled by a PHR augmented
  Lagrangian (ALTRO-style): outer iterations update multipliers and a scalar
  penalty; the inner iLQR minimizes the AL objective.
* **Gauss-Newton expansions**: every reference objective is diagonal-weighted
  least squares + inverse barriers. The fast path is the two-family split
  (``StageFunctions.q_rows``/``aff_rows``): FK-dependent rows are
  differentiated with only n tangents (the FK primitive's ``custom_jvp``
  supplies the analytic geometric Jacobian), affine rows use a constant
  build-time Jacobian whose Hessian contribution is a static GEMM. A
  stacked-``values`` GN path and a generic exact-Hessian fallback (with
  Gershgorin PSD shift) exist for custom problems.
* **Batching**: the whole solve is a pure function of
  ``(xinit, params, z0, lam0)`` with static shapes — ``jax.vmap`` turns it
  into a B-scenario batched device program, and sharding over a mesh scales
  the batch axis across chips (see ``robot_mpcs_tpu.parallel``).
* **Early exit**: the inner iLQR loop, the outer AL loop, and the
  backtracking line search are ``lax.while_loop``s. Under ``vmap`` each loop
  runs until every lane in the batch is done (per-lane freezing via done
  masks), so warm-started receding-horizon steps stop paying for the
  worst-case iteration budget. The iteration caps bind only on stragglers.
* **Linear dynamics shortcut**: holonomic robots have constant (A, B);
  they are computed once at build time and broadcast, removing per-stage
  Jacobian work from the hot loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from robot_mpcs_tpu.config import SolverConfiguration
from robot_mpcs_tpu.models.components import BARRIER_EPS
from robot_mpcs_tpu.solver.types import SolveResult


class StageFunctions(NamedTuple):
    """Per-stage problem callbacks in the solver's (x, w, p) convention,
    where ``w = [s, u]`` stacks slack + controls.

    ``values``/``weights`` carry the structured (Gauss-Newton) form:
    ``values(x, w, p)`` returns the stacked ``[residuals; barriers;
    constraints]`` vector (sharing subexpressions like FK across all three),
    ``weights(p)`` returns ``(w_res, w_bar)``. The stage cost is then
    ``sum(w_res * r^2) + sum(w_bar / b)`` and feasibility is ``c >= 0``.
    Set ``values=None`` for unstructured problems (generic fallback:
    ``cost``/``ineq`` with exact Hessians + Gershgorin PSD shift).
    """

    dynamics: Callable  # F(x, u) -> x_next
    cost: Callable  # cost(x, w, p) -> scalar (true objective)
    ineq: Callable  # con(x, w, p) -> (n_con,) feasible iff >= 0
    values: Optional[Callable] = None  # (x, w, p) -> (n_res + n_bar + n_con,)
    weights: Optional[Callable] = None  # p -> (w_res, w_bar)
    dyn_jac: Union[None, Tuple, Callable] = None  # (A, B) consts | fn(x, u)
    #: two-family split form (fastest path; see MpcProblem.split_callbacks):
    #: q_rows(q, p) -> FK-dependent [res; bar; con] rows (q = x[:n_q]),
    #: aff_rows(v, p) -> affine [res; bar; con] rows with constant Jacobian,
    #: weights_split(p) -> (w_res_q, w_bar_q, w_res_aff, w_bar_aff).
    q_rows: Optional[Callable] = None
    aff_rows: Optional[Callable] = None
    weights_split: Optional[Callable] = None


def _al_penalty(c: jnp.ndarray, lam: jnp.ndarray, mu: jnp.ndarray) -> jnp.ndarray:
    """PHR penalty for c >= 0: (1/2mu) * (max(0, lam - mu c)^2 - lam^2)."""
    active = jnp.maximum(0.0, lam - mu * c)
    return (0.5 / mu) * jnp.sum(active * active - lam * lam)


def build_solver(
    stage: StageFunctions,
    *,
    nx: int,
    ns: int,
    nu: int,
    N: int,
    n_con: int,
    n_res: int = 0,
    n_bar: int = 0,
    w_lb,
    w_ub,
    cfg: Optional[SolverConfiguration] = None,
    n_q: int = 0,
    q_seg: Optional[Tuple[int, int, int]] = None,
    aff_seg: Optional[Tuple[int, int, int]] = None,
    S_aff=None,
    pinned_rows=None,
):
    """Build ``solve(xinit, params, z0, lam0) -> SolveResult``.

    ``z0`` has shape (N, nx+ns+nu); its ``[s, u]`` tail seeds the control
    trajectory (warm start). ``lam0`` (N, n_con) warm-starts the multipliers
    across MPC steps. The returned function is jit/vmap-ready.
    """
    cfg = cfg or SolverConfiguration()
    nw = ns + nu
    nv = nx + nw
    dtype = jnp.float32 if cfg.dtype == "float32" else jnp.float64
    w_lb = jnp.broadcast_to(jnp.asarray(w_lb, dtype), (nw,))
    w_ub = jnp.broadcast_to(jnp.asarray(w_ub, dtype), (nw,))
    structured = stage.values is not None
    split = stage.q_rows is not None

    # ---------------- stage-level pieces ----------------------------------

    if split:
        # Two-family form (see MpcProblem.split_callbacks): FK-dependent
        # rows differentiated with n_q tangents; affine rows with a constant
        # build-time Jacobian whose Gauss-Newton contribution is two static
        # GEMMs. This is the hot path for every built-in robot model.
        import numpy as _np

        qr, qb, qc = q_seg
        ar, ab, ac = aff_seg
        n_qrows = qr + qb + qc
        if n_con != qc + ac:
            raise ValueError(f"n_con {n_con} != q_con {qc} + aff_con {ac}")
        S = jnp.asarray(S_aff, dtype)  # (n_arows, nv)
        S_outer = jnp.asarray(
            _np.einsum("ki,kj->kij", _np.asarray(S_aff), _np.asarray(S_aff)).reshape(
                ar + ab + ac, nv * nv
            ),
            dtype,
        )

        def eval_families(x, w, p):
            q = x[:n_q]
            vq = stage.q_rows(q, p)
            va = stage.aff_rows(jnp.concatenate([x, w]), p)
            if ns and qc:
                # slack-shift the q-family module constraint rows (the
                # affine family shifts its own rows inside aff_rows)
                vq = vq.at[qr + qb :].add(w[0])
            return vq, va

        def family_cost(vq, va, p):
            """(true stage cost, stacked constraint rows [con_q; con_aff])."""
            wrq, wbq, wra, wba = stage.weights_split(p)
            total = jnp.sum(wrq * vq[:qr] ** 2) + jnp.sum(wra * va[:ar] ** 2)
            total = total + jnp.sum(wbq / jnp.maximum(vq[qr : qr + qb], BARRIER_EPS))
            total = total + jnp.sum(wba / jnp.maximum(va[ar : ar + ab], BARRIER_EPS))
            c = jnp.concatenate([vq[qr + qb :], va[ar + ab :]])
            return total, c

        def true_cost(x, w, p):
            vq, va = eval_families(x, w, p)
            return family_cost(vq, va, p)[0]

        def stage_ineq(x, w, p):
            vq, va = eval_families(x, w, p)
            return jnp.concatenate([vq[qr + qb :], va[ar + ab :]])

        def al_stage_cost(x, w, p, lam, mu, c_off=None):
            vq, va = eval_families(x, w, p)
            cost, c = family_cost(vq, va, p)
            if c_off is not None:
                c = c + c_off
            return cost + _al_penalty(c, lam, mu)

        def _coefs(r, wr, b, wb, c, lam_seg, mu):
            """Per-row (gradient, curvature) scalars of the AL model:
            residual rows w r^2, barrier rows w / b, constraint rows PHR."""
            act = jnp.maximum(0.0, lam_seg - mu * c)
            # barrier rows are RAW clearances; the merit clamps them at
            # BARRIER_EPS, so inside the clamp the barrier contributes zero
            # gradient/curvature (the AL constraint supplies the restoring
            # force there)
            live = b > BARRIER_EPS
            bs = jnp.maximum(b, BARRIER_EPS)
            g = jnp.concatenate([2.0 * wr * r, jnp.where(live, -wb / (bs * bs), 0.0), -act])
            h = jnp.concatenate(
                [
                    2.0 * wr,
                    jnp.where(live, jnp.maximum(2.0 * wb / (bs * bs * bs), 0.0), 0.0),
                    mu * (act > 0),
                ]
            )
            return g, h

        n_arows = ar + ab + ac
        # build-time sparsity of the affine Jacobian: (col, coef) nonzeros
        # per row. Most rows (bounds, limits, control-penalty) have exactly
        # one nonzero, so the scalarized assembly below touches a handful
        # of entries instead of running an (n_arows x nv^2) GEMM.
        _S_np = _np.asarray(S_aff, _np.float64)
        _S_nz = [
            [(j, float(_S_np[r, j])) for j in range(nv) if _S_np[r, j] != 0.0]
            for r in range(n_arows)
        ]

        def _dense_blocks(Jq, gq, hq, ga, ha):
            """Per-lane reference assembly (matmul form): returns the
            Riccati blocks (lx, lw, lxx, lxw, lww) of the AL model."""
            g = S.T @ ga
            H = (S_outer.T @ ha).reshape(nv, nv)
            if n_qrows:
                g = g.at[:n_q].add(Jq.T @ gq)
                H = H.at[:n_q, :n_q].add((Jq.T * hq) @ Jq)
                if ns and qc:
                    s_col = nx
                    gq_c, hq_c, Jq_c = gq[qr + qb :], hq[qr + qb :], Jq[qr + qb :]
                    cross = Jq_c.T @ hq_c
                    g = g.at[s_col].add(jnp.sum(gq_c))
                    H = H.at[:n_q, s_col].add(cross)
                    H = H.at[s_col, :n_q].add(cross)
                    H = H.at[s_col, s_col].add(jnp.sum(hq_c))
            return g[:nx], g[nx:], H[:nx, :nx], H[:nx, nx:], H[nx:, nx:]

        @jax.custom_batching.custom_vmap
        def gn_assemble(Jq, gq, hq, ga, ha):
            return _dense_blocks(Jq, gq, hq, ga, ha)

        @gn_assemble.def_vmap
        def _gn_assemble_vmap(axis_size, in_batched, Jq, gq, hq, ga, ha):
            # Scalarized batch rule: every (row, col) entry is ONE batched
            # scalar, the whole assembly is elementwise FMAs XLA fuses into
            # a single VPU loop. The per-lane matmul form above lowers the
            # batched tiny matmuls to convolutions with GB-scale
            # intermediate traffic (measured 3.0 ms vs 0.3 ms at B=4096,
            # N=20 on v5e for the q-family block alone).
            Jq, gq, hq, ga, ha = [
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip((Jq, gq, hq, ga, ha), in_batched)
            ]
            bshape = gq.shape[:-1]
            dtype = gq.dtype

            def mat(v):
                return (
                    jnp.broadcast_to(jnp.asarray(v, dtype), bshape)
                    if isinstance(v, float)
                    else v
                )

            g_e = [0.0] * nv
            H_e = [[0.0] * nv for _ in range(nv)]
            # affine family: sparse S rows
            for r in range(n_arows):
                nzr = _S_nz[r]
                gr, hr = ga[..., r], ha[..., r]
                for i, ci in nzr:
                    g_e[i] = g_e[i] + ci * gr
                    for j, cj in nzr:
                        if j >= i:
                            H_e[i][j] = H_e[i][j] + (ci * cj) * hr
            # q family: dense (R x n_q) Jacobian block
            if n_qrows:
                J = [
                    [Jq[..., r, i] for i in range(n_q)] for r in range(n_qrows)
                ]
                for r in range(n_qrows):
                    gr, hr = gq[..., r], hq[..., r]
                    hJ = [hr * J[r][i] for i in range(n_q)]
                    for i in range(n_q):
                        g_e[i] = g_e[i] + J[r][i] * gr
                        for j in range(i, n_q):
                            H_e[i][j] = H_e[i][j] + hJ[i] * J[r][j]
                if ns and qc:
                    s_col = nx
                    for r in range(qr + qb, n_qrows):
                        gr, hr = gq[..., r], hq[..., r]
                        g_e[s_col] = g_e[s_col] + gr
                        H_e[s_col][s_col] = H_e[s_col][s_col] + hr
                        for i in range(n_q):
                            H_e[i][s_col] = H_e[i][s_col] + hr * J[r][i]
            # mirror the upper triangle
            for i in range(nv):
                for j in range(i + 1, nv):
                    H_e[j][i] = H_e[i][j]

            def block(i0, i1, j0, j1):
                return jnp.stack(
                    [
                        jnp.stack([mat(H_e[i][j]) for j in range(j0, j1)], axis=-1)
                        for i in range(i0, i1)
                    ],
                    axis=-2,
                )

            lx = jnp.stack([mat(g_e[i]) for i in range(nx)], axis=-1)
            lw = jnp.stack([mat(g_e[i]) for i in range(nx, nv)], axis=-1)
            lxx = block(0, nx, 0, nx)
            lxw = block(0, nx, nx, nv)
            lww = block(nx, nv, nx, nv)
            return (lx, lw, lxx, lxw, lww), (True,) * 5

        def _expansion_coefs(x, w, p, lam, mu, c_off=None):
            """(Jq, gq, hq, ga, ha): row Jacobian + per-row AL coefficients."""
            q = x[:n_q]
            vq, jvp_q = jax.linearize(lambda qq: stage.q_rows(qq, p), q)
            Jq = jax.vmap(jvp_q, out_axes=1)(jnp.eye(n_q, dtype=x.dtype))
            va = stage.aff_rows(jnp.concatenate([x, w]), p)
            if ns and qc:
                vq = vq.at[qr + qb :].add(w[0])
            cq, ca = vq[qr + qb :], va[ar + ab :]
            if c_off is not None:
                cq, ca = cq + c_off[:qc], ca + c_off[qc:]
            wrq, wbq, wra, wba = stage.weights_split(p)
            ga, ha = _coefs(
                va[:ar], wra, va[ar : ar + ab], wba, ca, lam[qc:], mu
            )
            gq, hq = (
                _coefs(vq[:qr], wrq, vq[qr : qr + qb], wbq, cq, lam[:qc], mu)
                if n_qrows
                else (jnp.zeros((0,), x.dtype), jnp.zeros((0,), x.dtype))
            )
            return Jq, gq, hq, ga, ha

        def stage_expansion_blocks(x, w, p, lam, mu, c_off=None):
            return gn_assemble(*_expansion_coefs(x, w, p, lam, mu, c_off))

        def stage_expansion(x, w, p, lam, mu, c_off=None):
            """(g, H) dense form — white-box/test surface; the solver's hot
            loop uses ``stage_expansion_blocks`` (same math, block outputs,
            scalarized batch rule)."""
            lx, lw, lxx, lxw, lww = stage_expansion_blocks(x, w, p, lam, mu, c_off)
            g = jnp.concatenate([lx, lw])
            H = jnp.block([[lxx, lxw], [lxw.T, lww]])
            return g, H

    elif structured:

        def split_vals(vals):
            return vals[:n_res], vals[n_res : n_res + n_bar], vals[n_res + n_bar :]

        def stage_cost_from_vals(vals, p):
            r, b, _ = split_vals(vals)
            w_res, w_bar = stage.weights(p)
            total = jnp.sum(w_res * r * r)
            if n_bar:
                total = total + jnp.sum(w_bar / jnp.maximum(b, BARRIER_EPS))
            return total

        def true_cost(x, w, p):
            return stage_cost_from_vals(stage.values(x, w, p), p)

        def stage_ineq(x, w, p):
            return split_vals(stage.values(x, w, p))[2]

    else:
        true_cost = stage.cost
        stage_ineq = stage.ineq

    if not split:

        def al_stage_cost(x, w, p, lam, mu, c_off=None):
            if structured:
                vals = stage.values(x, w, p)
                c = split_vals(vals)[2]
                if c_off is not None:
                    c = c + c_off
                return stage_cost_from_vals(vals, p) + _al_penalty(c, lam, mu)
            c = stage.ineq(x, w, p)
            if c_off is not None:
                c = c + c_off
            return stage.cost(x, w, p) + _al_penalty(c, lam, mu)

        def stage_expansion(x, w, p, lam, mu, c_off=None):
            """(g, H): exact AL gradient and PSD Hessian model at one stage."""
            v = jnp.concatenate([x, w])
            if structured:
                vals_fn = lambda vv: stage.values(vv[:nx], vv[nx:], p)
                vals = vals_fn(v)
                J = jax.jacfwd(vals_fn)(v)  # (n_res+n_bar+n_con, nv)
                r, b, c = split_vals(vals)
                if c_off is not None:
                    c = c + c_off
                Jr, Jb, Jc = J[:n_res], J[n_res : n_res + n_bar], J[n_res + n_bar :]
                w_res, w_bar = stage.weights(p)
                act = jnp.maximum(0.0, lam - mu * c)  # active multiplier estimate
                g = 2.0 * Jr.T @ (w_res * r) - Jc.T @ act
                H = 2.0 * (Jr.T * w_res) @ Jr + mu * (Jc.T * (act > 0)) @ Jc
                if n_bar:
                    live = b > BARRIER_EPS
                    bs = jnp.maximum(b, BARRIER_EPS)
                    g = g - Jb.T @ jnp.where(live, w_bar / (bs * bs), 0.0)
                    curv = jnp.where(
                        live, jnp.maximum(2.0 * w_bar / (bs * bs * bs), 0.0), 0.0
                    )
                    H = H + (Jb.T * curv) @ Jb
                return g, H
            # generic fallback: exact Hessian + Gershgorin PSD shift
            f = lambda vv: al_stage_cost(vv[:nx], vv[nx:], p, lam, mu, c_off)
            g = jax.grad(f)(v)
            H = jax.hessian(f)(v)
            H = 0.5 * (H + H.T)
            diag = jnp.diagonal(H)
            radius = jnp.sum(jnp.abs(H), axis=1) - jnp.abs(diag)
            shift = jnp.maximum(0.0, 1e-6 - jnp.min(diag - radius))
            return g, H + shift * jnp.eye(nv, dtype=H.dtype)

    # ---------------- pinned stage-0 constraint rows ------------------------
    # x[0] = xinit is DATA, not a decision variable, so a stage-0 constraint
    # row with no dependence on [s, u] is a constant: no solver can change
    # it, and folding it into the AL penalty only ratchets the penalty to
    # penalty_max and poisons conditioning for every live row (e.g. an
    # initial state already violating a clearance constraint would pin the
    # whole lane at "infeasible" forever). Such rows are masked by an
    # additive offset that makes them trivially satisfied at stage 0; all
    # other stages are untouched. The reference has the same structure (the
    # first stage's x is fixed by the xinit equality, reference
    # mpcPlanner.py:246-250) — ForcesPro simply reports exitflag < 0 there.
    import numpy as _np_pin

    if pinned_rows is not None:
        _pinned = _np_pin.asarray(pinned_rows, bool)
        if _pinned.shape != (n_con,):
            raise ValueError(f"pinned_rows shape {_pinned.shape} != ({n_con},)")
    elif split:
        _pinned = _np_pin.zeros((n_con,), bool)
        # q-family con rows reach z only through q ⊆ x (slack shift adds a
        # w column when ns > 0, making them live again)
        if ns == 0:
            _pinned[:qc] = True
        # affine con rows: pinned iff their constant Jacobian has no
        # [s, u] column (e.g. joint-limit and x-bound rows)
        S_con_w = _np_pin.asarray(S_aff)[ar + ab :, nx:]
        _pinned[qc:] = _np_pin.abs(S_con_w).sum(axis=1) == 0.0
    else:
        _pinned = _np_pin.zeros((n_con,), bool)
    C_OFF = jnp.zeros((N, max(n_con, 0)), dtype)
    if _pinned.any():
        C_OFF = C_OFF.at[0, _np_pin.where(_pinned)[0]].set(1e6)

    if isinstance(stage.dyn_jac, tuple):
        A_const = jnp.asarray(stage.dyn_jac[0], dtype)
        B_const = jnp.concatenate(
            [jnp.zeros((nx, ns), dtype), jnp.asarray(stage.dyn_jac[1], dtype)], axis=1
        )

        def all_dyn_jacobians(X, W):
            A = jnp.broadcast_to(A_const, (N, nx, nx))
            B = jnp.broadcast_to(B_const, (N, nx, nw))
            return A, B

    else:
        jac_fn = stage.dyn_jac

        def one_jac(x, w):
            u = w[ns:]
            if jac_fn is not None:
                A, Bu = jac_fn(x, u)
            else:
                A = jax.jacfwd(stage.dynamics, argnums=0)(x, u)
                Bu = jax.jacfwd(stage.dynamics, argnums=1)(x, u)
            B = jnp.concatenate([jnp.zeros((nx, ns), dtype=x.dtype), Bu], axis=1)
            return A, B

        def all_dyn_jacobians(X, W):
            return jax.vmap(one_jac)(X, W)

    def rollout(xinit, W):
        """Open-loop rollout: X[0] = xinit, X[k+1] = F(X[k], U[k])."""

        def step(x, w):
            x_next = stage.dynamics(x, w[ns:])
            return x_next, x

        _, X = lax.scan(step, xinit, W)
        return X  # (N, nx); the transition out of stage N is discarded

    def total_al_cost(X, W, P, lam, mu):
        return jnp.sum(
            jax.vmap(al_stage_cost, in_axes=(0, 0, 0, 0, None, 0))(
                X, W, P, lam, mu, C_OFF
            )
        )

    # ---------------- backward Riccati sweep -------------------------------

    def backward(lx, lw, lxx, lxw, lww, A, B, reg):
        """One Riccati sweep. Per-stage tensors have leading dim N; stage N
        (index N-1) has A = B = 0 so the recursion degenerates to a pure
        stage minimization there (the reference's terminal stage also carries
        controls in its cost, mpcModel.py:85-86)."""

        def step(carry, inp):
            vx, Vxx, failed = carry
            lx_k, lw_k, lxx_k, lxw_k, lww_k, A_k, B_k = inp
            Qxx = lxx_k + A_k.T @ Vxx @ A_k
            Qxw = lxw_k + A_k.T @ Vxx @ B_k
            Qww = lww_k + B_k.T @ Vxx @ B_k + reg * jnp.eye(nw, dtype=lx_k.dtype)
            qx = lx_k + A_k.T @ vx
            qw = lw_k + B_k.T @ vx
            if nw <= 24:
                # unrolled pure-jnp Cholesky (ops/linalg_small): no LAPACK
                # custom calls -> AOT-serializable + fuses under vmap
                from robot_mpcs_tpu.ops.linalg_small import chol_solve_unrolled

                sol, bad = chol_solve_unrolled(
                    Qww, jnp.concatenate([qw[:, None], Qxw.T], axis=1)
                )
                sol = jnp.where(bad, jnp.zeros_like(sol), -sol)
                k_ff, K = sol[:, 0], sol[:, 1:]
            else:
                L = jnp.linalg.cholesky(Qww)
                bad = jnp.any(jnp.isnan(L))
                L_safe = jnp.where(bad, jnp.eye(nw, dtype=L.dtype), L)
                solve_chol = lambda rhs: jax.scipy.linalg.cho_solve(
                    (L_safe, True), rhs
                )
                # on a failed factorization emit a zero direction through
                # this stage (the iteration-level reg escalation will retry)
                k_ff = jnp.where(bad, jnp.zeros((nw,), qw.dtype), -solve_chol(qw))
                K = jnp.where(
                    bad, jnp.zeros((nw, nx), qw.dtype), -solve_chol(Qxw.T)
                )
            vx_new = qx + Qxw @ k_ff + K.T @ qw + K.T @ Qww @ k_ff
            Vxx_new = Qxx + Qxw @ K + K.T @ Qxw.T + K.T @ Qww @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return (vx_new, Vxx_new, jnp.logical_or(failed, bad)), (k_ff, K)

        init = (
            jnp.zeros((nx,), dtype=lx.dtype),
            jnp.zeros((nx, nx), dtype=lx.dtype),
            jnp.asarray(False),
        )
        (_, _, failed), (k_ff, K) = lax.scan(
            step, init, (lx, lw, lxx, lxw, lww, A, B), reverse=True
        )
        return k_ff, K, failed

    # Pallas fused sweep: when the solve is vmapped on TPU, the batched
    # backward runs as one VMEM-resident kernel (batch on lanes) instead of
    # N scan steps of padded tiny-matrix ops — see riccati_pallas.py.
    riccati_mode = getattr(cfg, "riccati_backend", "auto")
    use_pallas = riccati_mode == "pallas" or (
        riccati_mode == "auto" and jax.default_backend() != "cpu"
    )
    if use_pallas:
        from robot_mpcs_tpu.ops.riccati_pallas import riccati_backward_batched
        from robot_mpcs_tpu.ops.riccati_packed import (
            detect_structure,
            riccati_backward_packed,
        )

        # Structured fast path: holonomic constant dynamics have the exact
        # block form A = [[I, aI],[0, I]], B = [[b1 E],[b2 E]] — verified
        # numerically here at build time. The packed kernel bakes the
        # structure in and ignores the (A, B) operands, which is valid
        # because the batched `backward` below is only ever called with the
        # broadcast build-time constants (stage N-1 zeroed, equivalent to
        # the kernel's zero terminal value function).
        packed_struct = None
        if isinstance(stage.dyn_jac, tuple):
            import numpy as _np_st

            packed_struct = detect_structure(
                _np_st.asarray(stage.dyn_jac[0]),
                _np_st.concatenate(
                    [
                        _np_st.zeros((nx, ns), dtype=_np_st.float64),
                        _np_st.asarray(stage.dyn_jac[1]),
                    ],
                    axis=1,
                ),
                nx=nx,
                ns=ns,
            )

        scan_backward = backward

        @jax.custom_batching.custom_vmap
        def backward(lx, lw, lxx, lxw, lww, A, B, reg):
            return scan_backward(lx, lw, lxx, lxw, lww, A, B, reg)

        @backward.def_vmap
        def _backward_vmap(axis_size, in_batched, *args):
            # A/B (indices 5, 6) stay unbatched when the dynamics Jacobians
            # are batch-constant — the kernel broadcasts them on lanes
            dyn_batched = in_batched[5] or in_batched[6]
            if not dyn_batched and packed_struct is not None:
                a_s, b1_s, b2_s = packed_struct
                lx_, lw_, lxx_, lxw_, lww_ = [
                    arg if b else jnp.broadcast_to(arg[None], (axis_size,) + arg.shape)
                    for arg, b in zip(args[:5], in_batched[:5])
                ]
                reg_ = (
                    args[7]
                    if in_batched[7]
                    else jnp.broadcast_to(args[7][None], (axis_size,))
                )
                out = riccati_backward_packed(
                    lx_, lw_, lxx_, lxw_, lww_, reg_,
                    N=N, nx=nx, nw=nw, ns=ns, a=a_s, b1=b1_s, b2=b2_s,
                )
                return out, (True, True, True)
            # VMEM budget check: per 128-lane block the kernel double-buffers
            # its stage tensors; fall back to the vmapped scan if the
            # footprint cannot fit (large nx with batched dynamics)
            words = nx + nw + nx * nx + nx * nw + nw * nw  # l* terms
            if dyn_batched:
                words += nx * nx + nx * nw
            words += nw + nw * nx  # outputs
            vmem_bytes = 2 * 4 * N * 128 * words + (3 << 20)
            if vmem_bytes > (15 << 20):
                import warnings

                warnings.warn(
                    f"Riccati Pallas kernel disabled for this problem: the "
                    f"per-block VMEM footprint ({vmem_bytes >> 20} MiB with "
                    f"batched dynamics at N={N}, nx={nx}, nw={nw}) exceeds "
                    f"the 15 MiB budget — falling back to the vmapped scan "
                    f"backward (slower).",
                    stacklevel=2,
                )
                return jax.vmap(scan_backward)(*[
                    a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                    for a, b in zip(args, in_batched)
                ]), (True, True, True)
            args = [
                a
                if b or i in (5, 6)
                else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for i, (a, b) in enumerate(zip(args, in_batched))
            ]
            k_ff, K, failed = riccati_backward_batched(
                *args, N=N, nx=nx, nw=nw
            )
            return (k_ff, K, failed), (True, True, True)

    # ---------------- forward pass with batched line search ----------------

    def forward(xinit, X_ref, W_ref, k_ff, K, P, lam, mu, alpha):
        # The sequential part carries only the (cheap) dynamics + gain
        # application; the FK-heavy merit evaluation happens afterwards as
        # one stage-batched op rather than 20 sequential ones.
        def step(x, inp):
            x_ref, w_ref, k_k, K_k = inp
            w = w_ref + alpha * k_k + K_k @ (x - x_ref)
            w = jnp.clip(w, w_lb, w_ub)
            x_next = stage.dynamics(x, w[ns:])
            return x_next, (x, w)

        _, (X, W) = lax.scan(step, xinit, (X_ref, W_ref, k_ff, K))
        # PER-STAGE merit vector, not the sum: the line search accepts on the
        # sum of per-stage DIFFERENCES, whose f32 noise floor is ~N x lower
        # than comparing two accumulated totals (eps*stage_cost*sqrt(N) vs
        # eps*total) — this is what lets the polish reach ~1e-4-level steps
        # and the <1e-3 control-error parity bar (tests/test_parity.py)
        costs = jax.vmap(al_stage_cost, in_axes=(0, 0, 0, 0, None, 0))(
            X, W, P, lam, mu, C_OFF
        )
        return X, W, costs

    # ---------------- inner iLQR loop --------------------------------------

    def ilqr(xinit, X, W, P, lam, mu, frozen=None, gn0=None):
        """Inner iLQR on the AL objective. A ``while_loop`` (not a fixed
        scan) so a warm-started batch that converges early stops paying for
        the remaining iteration budget — under ``vmap`` the loop runs until
        every scenario in the batch is done (per-scenario freezing via the
        ``done`` mask), which on receding-horizon steps is typically a
        handful of iterations.

        ``frozen``: lanes already finished in the outer AL loop enter with
        ``done=True`` so they contribute zero trips to the batched loop.
        ``gn0``: the frozen lane's previously reported stationarity measure
        (kept verbatim so the outer loop's convergence bookkeeping is stable).
        """
        if frozen is None:
            frozen = jnp.asarray(False)
        if gn0 is None:
            gn0 = jnp.asarray(jnp.inf, dtype)

        def cond(carry):
            _, _, _, _, done, _, _, it = carry
            return jnp.logical_and(it < cfg.max_ilqr_iterations, ~done)

        def body(carry):
            X, W, cost_cur, reg, done, grad_norm, n_used, it = carry
            if split:
                lx, lw, lxx, lxw, lww = jax.vmap(
                    stage_expansion_blocks, in_axes=(0, 0, 0, 0, None, 0)
                )(X, W, P, lam, mu, C_OFF)
            else:
                g, H = jax.vmap(stage_expansion, in_axes=(0, 0, 0, 0, None, 0))(
                    X, W, P, lam, mu, C_OFF
                )
                lx, lw = g[:, :nx], g[:, nx:]
                lxx, lxw, lww = H[:, :nx, :nx], H[:, :nx, nx:], H[:, nx:, nx:]
            A, B = all_dyn_jacobians(X, W)
            # stage N has no outgoing dynamics
            A = A.at[-1].set(0.0)
            B = B.at[-1].set(0.0)
            k_ff, K, failed = backward(lx, lw, lxx, lxw, lww, A, B, reg)
            gn_step = jnp.max(jnp.abs(k_ff))
            # tiny Newton step: no search needed (the lane is declared done
            # below); near-stationary: probe only alpha = 1 — if the full
            # step can't improve, backtracked fractions of a sub-tolerance
            # step can't deliver a measurable f32 merit decrease either, and
            # each extra probe costs the whole batch one merit sweep
            tiny_step = gn_step < cfg.tol_gradient
            near_stat = gn_step < cfg.tol_stationarity
            max_ls = jnp.where(
                near_stat, 1, jnp.asarray(cfg.line_search_steps, jnp.int32)
            )

            # Backtracking line search with early exit: a warm-started
            # receding-horizon step almost always accepts the full Newton
            # step, so evaluating candidates one at a time (largest alpha
            # first) and stopping at the first improvement costs ~1 merit
            # sweep in the common case instead of line_search_steps of them
            # (worst case identical). Under vmap, lanes that accepted stop
            # updating; the loop runs while any lane is still searching.
            def ls_cond(c):
                ls_it, accepted, _, _, _ = c
                return jnp.logical_and(ls_it < max_ls, ~accepted)

            def ls_body(c):
                ls_it, accepted, Xb, Wb, costb = c
                alpha = cfg.line_search_decay ** ls_it.astype(dtype)
                X_c, W_c, cost_c = forward(xinit, X, W, k_ff, K, P, lam, mu, alpha)
                # accept on the summed per-stage cost DIFFERENCE (see
                # `forward`): cancellation happens per stage, so the
                # comparison resolves improvements ~N x below the noise
                # floor of a total-vs-total comparison
                delta = jnp.sum(cost_c - cost_cur)
                better = jnp.logical_and(
                    jnp.all(jnp.isfinite(cost_c)), delta < -1e-9
                )
                take_c = better & ~accepted
                Xb = jnp.where(take_c, X_c, Xb)
                Wb = jnp.where(take_c, W_c, Wb)
                costb = jnp.where(take_c, cost_c, costb)
                return ls_it + 1, accepted | better, Xb, Wb, costb

            # Lanes that are already done, whose factorization failed
            # (k_ff = 0 — every candidate equals the current point), or
            # whose Newton step is already below tol_gradient start
            # "accepted": under vmap the batched loop's trip count is the
            # max over lanes still searching, so letting them search would
            # force full-depth merit sweeps on the whole batch every
            # iteration for zero benefit.
            skip_ls = done | failed | tiny_step
            _, improved, X_ls, W_ls, cost_ls = lax.while_loop(
                ls_cond,
                ls_body,
                (jnp.asarray(0, jnp.int32), skip_ls, X, W, cost_cur),
            )
            improved = improved & ~skip_ls
            accept = jnp.logical_and(improved, jnp.logical_not(failed))

            take = accept & ~done
            X_new = jnp.where(take, X_ls, X)
            W_new = jnp.where(take, W_ls, W)
            cost_new = jnp.where(take, cost_ls, cost_cur)
            # freeze reg and the grad-norm diagnostic for lanes that already
            # converged: under vmap a done lane keeps executing the body while
            # stragglers finish, and letting gn/reg drift would make the lane
            # exit reporting grad_norm > tol (keeping the outer AL loop alive
            # and flipping its exitflag to 0 despite convergence).
            # Escalate reg only on a genuine failure (bad factorization or a
            # searched-and-rejected step) — tiny-step lanes skipped the
            # search and must not be punished into the reg guard.
            escalate = failed | (~improved & ~tiny_step)
            # A tiny Newton step at HIGH reg is ambiguous: k_ff ~ grad/reg, so
            # the lane cannot be declared converged (reg > reg_converged_max
            # blocks `done` below) — but it also skipped the line search, so
            # without intervention reg never changes and the lane livelocks,
            # spinning the whole vmapped batch to the full budget. Decay reg
            # toward reg_converged_max: if the step stays tiny at honest reg
            # the lane converges; if a real step re-emerges the normal
            # accept/escalate path resumes.
            decay_probe = tiny_step & ~failed & (reg > cfg.reg_converged_max)
            reg_step = jnp.where(
                accept,
                jnp.maximum(reg * 0.5, cfg.reg_min),
                jnp.where(
                    escalate,
                    jnp.minimum(reg * 10.0, cfg.reg_max),
                    jnp.where(decay_probe, jnp.maximum(reg * 0.1, cfg.reg_min), reg),
                ),
            )
            reg_new = jnp.where(done, reg, reg_step)
            gn = jnp.where(done, grad_norm, gn_step)
            # Stationarity exit, two tiers. Deliberately NOT gated on
            # `accept` — at a converged point the line search cannot improve
            # the merit, so an accept-gated exit would never fire and every
            # converged lane would burn the full budget (the round-2 bench
            # pinned mean_iterations at the exact cap for this reason).
            # (a) the Newton step is below tol_gradient: clean convergence;
            # (b) the line search found NO improvement and the Newton step
            #     is already below tol_stationarity: the merit decrease a
            #     step this size could deliver (~|k|^2·H) is beneath the
            #     f32 merit noise floor (~1e-5 relative), so further
            #     iterations cannot make measurable progress — converged to
            #     working precision.
            # Guards: a failed factorization emits k_ff = 0 (not
            # convergence), and a huge LM reg shrinks k_ff artificially
            # (reg <= reg_converged_max keeps the measure honest).
            done_new = done | (
                ~failed
                & (reg <= cfg.reg_converged_max)
                & (
                    (gn_step < cfg.tol_gradient)
                    | (~improved & (gn_step < cfg.tol_stationarity))
                )
            )
            # per-lane iteration count (the shared `it` is the max over lanes)
            n_used_new = n_used + jnp.where(done, 0, 1)
            return (X_new, W_new, cost_new, reg_new, done_new, gn, n_used_new, it + 1)

        carry = lax.while_loop(
            cond,
            body,
            (
                X,
                W,
                jax.vmap(al_stage_cost, in_axes=(0, 0, 0, 0, None, 0))(
                    X, W, P, lam, mu, C_OFF
                ),
                jnp.asarray(cfg.reg_initial, dtype),
                frozen,
                gn0,
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32),
            ),
        )
        X, W, _, _, _, grad_norm, n_used, _ = carry
        return X, W, grad_norm, n_used

    # ---------------- outer AL loop -----------------------------------------

    def _solve_impl(xinit, params, z0, lam0=None):
        xinit = jnp.asarray(xinit, dtype)
        P = jnp.asarray(params, dtype)
        z0 = jnp.asarray(z0, dtype)
        W = jnp.clip(z0[:, nx:], w_lb, w_ub)
        X = rollout(xinit, W)
        lam = (
            jnp.zeros((N, n_con), dtype)
            if lam0 is None
            else jnp.asarray(lam0, dtype)
        )
        mu0 = jnp.asarray(cfg.penalty_initial, dtype)

        def outer_cond(carry):
            finished, it = carry[-2], carry[-1]
            return jnp.logical_and(it < cfg.max_al_iterations, ~finished)

        def outer_body(carry):
            X, W, lam, mu, grad_norm, n_inner, _, finished, it = carry
            # finished lanes enter the inner loop frozen (done=True): they
            # contribute zero trips to the batched while_loop and keep
            # reporting their frozen stationarity measure
            X, W, gn, used = ilqr(xinit, X, W, P, lam, mu, finished, grad_norm)
            # pinned stage-0 rows are offset out of both the multiplier
            # update and the feasibility measure (see C_OFF above)
            C = jax.vmap(stage_ineq)(X, W, P) + C_OFF  # (N, n_con)
            viol = (
                jnp.max(jnp.maximum(0.0, -C))
                if n_con > 0
                else jnp.asarray(0.0, dtype=X.dtype)
            )
            # freeze multipliers/penalty on finished lanes so the solution
            # (and the warm start handed to the next MPC step) is stable
            lam_new = jnp.where(finished, lam, jnp.maximum(0.0, lam - mu * C))
            mu_new = jnp.where(
                finished,
                mu,
                jnp.where(
                    viol > cfg.tol_constraint,
                    jnp.minimum(mu * cfg.penalty_scale, cfg.penalty_max),
                    mu,
                ),
            )
            finished_new = finished | (
                (viol <= cfg.tol_constraint) & (gn <= cfg.tol_stationarity)
            )
            return (X, W, lam_new, mu_new, gn, n_inner + used, viol, finished_new, it + 1)

        # early exit once feasible + stationary (a warm-started receding-
        # horizon batch often needs a single multiplier pass); worst case
        # matches the fixed budget of max_al_iterations
        carry = lax.while_loop(
            outer_cond,
            outer_body,
            (
                X,
                W,
                lam,
                mu0,
                jnp.asarray(jnp.inf, dtype),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(jnp.inf, dtype),
                jnp.asarray(False),
                jnp.asarray(0, jnp.int32),
            ),
        )
        X, W, lam, _, grad_norm, n_inner, viol, finished, _ = carry
        # `viol` is the loop's final-body value, computed from the final
        # (X, W) — the body never mutates them afterwards, so no recompute

        cost = jnp.sum(jax.vmap(true_cost)(X, W, P))
        z = jnp.concatenate([X, W], axis=-1)
        # Raw (unmasked) stage-0 violation: pinned stage-0 rows are constants
        # of the DATA xinit (see C_OFF above) and are excluded from the
        # solver's feasibility measure — but safety monitoring must still see
        # an in-collision start (the reference would report exitflag < 0
        # there, mpcPlanner.py:263). One extra stage evaluation, off the
        # iteration hot path.
        if n_con > 0 and bool(_pinned.any()):
            c0_raw = stage_ineq(X[0], W[0], P[0])
            violation0_raw = jnp.max(jnp.maximum(0.0, -c0_raw))
        else:
            violation0_raw = jnp.asarray(0.0, dtype)

        # a finite trajectory with non-finite violation/cost/stationarity
        # (e.g. NaN parameters) is still a numerical failure, not a usable plan
        finite = (
            jnp.all(jnp.isfinite(z))
            & jnp.isfinite(viol)
            & jnp.isfinite(cost)
            & jnp.isfinite(grad_norm)
        )
        converged = finite & finished
        exitflag = jnp.where(converged, 1, jnp.where(finite, 0, -1)).astype(jnp.int32)
        return SolveResult(
            z=z,
            exitflag=exitflag,
            cost=cost,
            violation=viol,
            grad_norm=grad_norm,
            lam=lam,
            iterations=n_inner,
            violation0_raw=violation0_raw,
        )

    def solve(xinit, params, z0, lam0=None):
        # TPU f32 dots default to bf16 input precision (~8 mantissa bits);
        # the Gauss-Newton assembly GEMMs carry mu-scaled terms (up to
        # penalty_max), so bf16 noise swamps the 1e-4-level Newton steps the
        # convergence tests need — lanes then stall at gn ~ 1e-3 and never
        # reach exitflag 1 (observed on v5e: converged_fraction 0.27 vs 0.97
        # with full f32). The matrices are tiny (<= 24 wide, padding-bound
        # on the MXU), so full-f32 dots cost little wall clock here.
        with jax.default_matmul_precision("float32"):
            return _solve_impl(xinit, params, z0, lam0)

    # expose internals for white-box tests and debugging
    solve._internals = {
        "rollout": rollout,
        "stage_expansion": stage_expansion,
        "all_dyn_jacobians": all_dyn_jacobians,
        "backward": backward,
        "forward": forward,
        "ilqr": ilqr,
        "al_stage_cost": al_stage_cost,
        "total_al_cost": total_al_cost,
        "true_cost": true_cost,
        "stage_ineq": stage_ineq,
    }
    return solve

"""Batched augmented-Lagrangian iLQR — the TPU-native NLP solver core.

This replaces the ForcesPro-generated interior-point C solver the reference
drives (reference ``robotmpcs/models/mpcModel.py:74-129`` builds the problem,
``robotmpcs/planner/mpcPlanner.py:262`` calls ``solver.solve``). Design:

* **Equality structure (stage dynamics)** is eliminated by a Riccati backward
  sweep over the horizon — the same block-tridiagonal KKT factorization an
  interior-point stage solver performs, expressed as ``lax.scan`` so XLA
  compiles it into one fused loop of tiny-matrix ops.
* **Inequalities + variable bounds** are handled by a PHR augmented
  Lagrangian (ALTRO-style): fixed outer iterations update multipliers and a
  scalar penalty; the inner iLQR minimizes the AL objective.
* **Gauss-Newton expansions**: every reference objective is diagonal-weighted
  least squares + inverse barriers, so one ``jacfwd`` of the stacked
  [residuals; barriers; constraints] vector yields the exact AL gradient and
  a PSD-by-construction Hessian (J' D J products). No second-derivative
  graphs, no eigendecompositions — the per-iteration work is dense
  (rows x nv) x (nv x nv) matmul batches that XLA maps straight onto the
  VPU/MXU. (A generic exact-Hessian fallback with Gershgorin PSD shift
  exists for unstructured custom costs.)
* **Batching**: the whole solve is a pure function of
  ``(xinit, params, z0, lam0)`` with static shapes and fixed iteration
  counts — ``jax.vmap`` turns it into a B-scenario batched device program,
  and sharding over a mesh scales the batch axis across chips (see
  ``robot_mpcs_tpu.parallel``).
* **Linear dynamics shortcut**: holonomic robots have constant (A, B);
  they are computed once at build time and broadcast, removing per-stage
  Jacobian work from the hot loop.

Per-scenario early exit is impossible under vmap, so convergence is handled
with done-masking: converged scenarios freeze their iterates while the batch
finishes the fixed iteration budget (the reference has no batching at all —
one C solve per scenario per step, ``mpcPlanner.py:240-288``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from robot_mpcs_tpu.config import SolverConfiguration
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

    alphas = cfg.line_search_decay ** jnp.arange(cfg.line_search_steps, dtype=dtype)

    # ---------------- stage-level pieces ----------------------------------

    if structured:

        def split_vals(vals):
            return vals[:n_res], vals[n_res : n_res + n_bar], vals[n_res + n_bar :]

        def stage_cost_from_vals(vals, p):
            r, b, _ = split_vals(vals)
            w_res, w_bar = stage.weights(p)
            total = jnp.sum(w_res * r * r)
            if n_bar:
                total = total + jnp.sum(w_bar / b)
            return total

        def true_cost(x, w, p):
            return stage_cost_from_vals(stage.values(x, w, p), p)

        def stage_ineq(x, w, p):
            return split_vals(stage.values(x, w, p))[2]

    else:
        true_cost = stage.cost
        stage_ineq = stage.ineq

    def al_stage_cost(x, w, p, lam, mu):
        if structured:
            vals = stage.values(x, w, p)
            c = split_vals(vals)[2]
            return stage_cost_from_vals(vals, p) + _al_penalty(c, lam, mu)
        return stage.cost(x, w, p) + _al_penalty(stage.ineq(x, w, p), lam, mu)

    def stage_expansion(x, w, p, lam, mu):
        """(g, H): exact AL gradient and PSD Hessian model at one stage."""
        v = jnp.concatenate([x, w])
        if structured:
            vals_fn = lambda vv: stage.values(vv[:nx], vv[nx:], p)
            vals = vals_fn(v)
            J = jax.jacfwd(vals_fn)(v)  # (n_res+n_bar+n_con, nv)
            r, b, c = split_vals(vals)
            Jr, Jb, Jc = J[:n_res], J[n_res : n_res + n_bar], J[n_res + n_bar :]
            w_res, w_bar = stage.weights(p)
            act = jnp.maximum(0.0, lam - mu * c)  # active multiplier estimate
            g = 2.0 * Jr.T @ (w_res * r) - Jc.T @ act
            H = 2.0 * (Jr.T * w_res) @ Jr + mu * (Jc.T * (act > 0)) @ Jc
            if n_bar:
                g = g - Jb.T @ (w_bar / (b * b))
                curv = jnp.maximum(2.0 * w_bar / (b * b * b), 0.0)
                H = H + (Jb.T * curv) @ Jb
            return g, H
        # generic fallback: exact Hessian + Gershgorin PSD shift
        f = lambda vv: al_stage_cost(vv[:nx], vv[nx:], p, lam, mu)
        g = jax.grad(f)(v)
        H = jax.hessian(f)(v)
        H = 0.5 * (H + H.T)
        diag = jnp.diagonal(H)
        radius = jnp.sum(jnp.abs(H), axis=1) - jnp.abs(diag)
        shift = jnp.maximum(0.0, 1e-6 - jnp.min(diag - radius))
        return g, H + shift * jnp.eye(nv, dtype=H.dtype)

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
            jax.vmap(al_stage_cost, in_axes=(0, 0, 0, 0, None))(X, W, P, lam, mu)
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
            L = jnp.linalg.cholesky(Qww)
            bad = jnp.any(jnp.isnan(L))
            L_safe = jnp.where(bad, jnp.eye(nw, dtype=L.dtype), L)
            solve_chol = lambda rhs: jax.scipy.linalg.cho_solve((L_safe, True), rhs)
            # on a failed factorization emit a zero direction through this
            # stage (the iteration-level reg escalation will retry)
            k_ff = jnp.where(bad, jnp.zeros((nw,), qw.dtype), -solve_chol(qw))
            K = jnp.where(bad, jnp.zeros((nw, nx), qw.dtype), -solve_chol(Qxw.T))
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
        costs = jax.vmap(al_stage_cost, in_axes=(0, 0, 0, 0, None))(X, W, P, lam, mu)
        return X, W, jnp.sum(costs)

    # ---------------- inner iLQR loop --------------------------------------

    def ilqr(xinit, X, W, P, lam, mu):
        def iteration(carry, _):
            X, W, reg, done, grad_norm, n_used = carry
            g, H = jax.vmap(stage_expansion, in_axes=(0, 0, 0, 0, None))(X, W, P, lam, mu)
            lx, lw = g[:, :nx], g[:, nx:]
            lxx, lxw, lww = H[:, :nx, :nx], H[:, :nx, nx:], H[:, nx:, nx:]
            A, B = all_dyn_jacobians(X, W)
            # stage N has no outgoing dynamics
            A = A.at[-1].set(0.0)
            B = B.at[-1].set(0.0)
            k_ff, K, failed = backward(lx, lw, lxx, lxw, lww, A, B, reg)

            cost_old = total_al_cost(X, W, P, lam, mu)
            X_c, W_c, cost_c = jax.vmap(
                lambda a: forward(xinit, X, W, k_ff, K, P, lam, mu, a)
            )(alphas)
            best = jnp.argmin(jnp.where(jnp.isfinite(cost_c), cost_c, jnp.inf))
            improved = jnp.logical_and(
                jnp.isfinite(cost_c[best]), cost_c[best] < cost_old - 1e-9
            )
            accept = jnp.logical_and(improved, jnp.logical_not(failed))

            X_new = jnp.where(accept & ~done, X_c[best], X)
            W_new = jnp.where(accept & ~done, W_c[best], W)
            reg_new = jnp.where(
                accept,
                jnp.maximum(reg * 0.5, cfg.reg_min),
                jnp.minimum(reg * 10.0, cfg.reg_max),
            )
            gn = jnp.max(jnp.abs(k_ff))
            done_new = done | (accept & (gn < cfg.tol_gradient))
            n_used = n_used + jnp.where(done, 0, 1)
            return (X_new, W_new, reg_new, done_new, gn, n_used), None

        reg0 = jnp.asarray(cfg.reg_initial, dtype)
        done0 = jnp.asarray(False)
        carry, _ = lax.scan(
            iteration,
            (X, W, reg0, done0, jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32)),
            None,
            length=cfg.max_ilqr_iterations,
        )
        X, W, _, _, grad_norm, n_used = carry
        return X, W, grad_norm, n_used

    # ---------------- outer AL loop -----------------------------------------

    def solve(xinit, params, z0, lam0=None):
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

        def outer(carry, _):
            X, W, lam, mu, grad_norm, n_inner = carry
            X, W, gn, used = ilqr(xinit, X, W, P, lam, mu)
            C = jax.vmap(stage_ineq)(X, W, P)  # (N, n_con)
            lam_new = jnp.maximum(0.0, lam - mu * C)
            viol = (
                jnp.max(jnp.maximum(0.0, -C))
                if n_con > 0
                else jnp.asarray(0.0, dtype=X.dtype)
            )
            mu_new = jnp.where(
                viol > cfg.tol_constraint,
                jnp.minimum(mu * cfg.penalty_scale, cfg.penalty_max),
                mu,
            )
            return (X, W, lam_new, mu_new, gn, n_inner + used), None

        carry, _ = lax.scan(
            outer,
            (X, W, lam, mu0, jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32)),
            None,
            length=cfg.max_al_iterations,
        )
        X, W, lam, _, grad_norm, n_inner = carry

        C = jax.vmap(stage_ineq)(X, W, P)
        viol = (
            jnp.max(jnp.maximum(0.0, -C))
            if n_con > 0
            else jnp.asarray(0.0, dtype)
        )
        cost = jnp.sum(jax.vmap(true_cost)(X, W, P))
        z = jnp.concatenate([X, W], axis=-1)

        finite = jnp.all(jnp.isfinite(z))
        converged = finite & (viol <= cfg.tol_constraint) & (grad_norm <= cfg.tol_stationarity)
        exitflag = jnp.where(converged, 1, jnp.where(finite, 0, -1)).astype(jnp.int32)
        return SolveResult(
            z=z,
            exitflag=exitflag,
            cost=cost,
            violation=viol,
            grad_norm=grad_norm,
            lam=lam,
            iterations=n_inner,
        )

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

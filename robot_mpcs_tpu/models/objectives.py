"""Objective (stage cost) components.

Re-designs of reference ``robotmpcs/models/objectives/*``. Each component
exposes its cost in structured form (diagonal-weighted residuals and/or
inverse barriers, see ``ObjectiveComponent``) so the solver can assemble
Gauss-Newton Hessians from a single Jacobian pass. The total stage cost
assembled in ``problem.py`` is

    sum(objective modules) + u' diag(wu) u + ws * s^2

matching ``ObjectiveManager.eval_objectives`` (reference
``ObjectiveManager.py:28-42``); the terminal cost equals the stage cost
(``eval_objectiveN``, :44-46).
"""

from __future__ import annotations

import jax.numpy as jnp

from robot_mpcs_tpu.models.components import (
    ModelContext,
    ObjectiveComponent,
    obstacle_distances,
)
from robot_mpcs_tpu.models.params import ParamMap


def _safe_barrier(b: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Clamp a barrier denominator to be strictly positive.

    The reference's raw ``1/c`` becomes *negative* on infeasible iterates
    (c < 0), rewarding the minimizer for diving through obstacles — its
    interior-point solver never visits that region, but an AL method does
    during intermediate iterations. Clamping to ``max(c, eps)`` caps the
    repulsion at a large positive plateau (zero gradient inside violation;
    the hard AL constraint supplies the restoring force) while matching the
    reference exactly on the feasible set where c >= eps.
    """
    return jnp.maximum(b, eps)


class GoalReaching(ObjectiveComponent):
    """``(fk_ee(q) - goal)' diag(wgoal) (fk_ee(q) - goal)``
    (reference ``goal_reaching.py:19-33``)."""

    name = "GoalReaching"

    def __init__(self, ctx: ModelContext):
        super().__init__(ctx)
        self.n_res = self.dims.m

    def register_params(self, pm: ParamMap) -> None:
        pm.register("goal", self.dims.m)
        pm.register("wgoal", self.dims.m)

    def residuals(self, z, p, pm):
        q, _, _ = self.dims.extract_variables(z)
        pos_ee = self.ctx.kin.fk_pos(q, self.ctx.robot.end_link)[: self.dims.m]
        return pos_ee - pm.get(p, "goal"), pm.get(p, "wgoal")


class ConstraintAvoidance(ObjectiveComponent):
    """Soft inverse-clearance repulsion from constraint boundaries.

    Reference ``constraint_avoidance.py:22-31`` adds, for each constraint
    module i, ``w_i / c_i0`` (only the module's FIRST inequality row) once per
    horizon stage index — i.e. the term is scaled by N inside a single stage
    cost. We reproduce that weighting (``N * w_i / c_i0``) so reference
    configs tune identically, and guard the reciprocal's pole.
    """

    name = "ConstraintAvoidance"

    def __init__(self, ctx: ModelContext, ineq_modules=()):
        super().__init__(ctx)
        self.ineq_modules = [m for m in ineq_modules if m.n_ineq > 0]
        self.n_bar = len(self.ineq_modules)

    def register_params(self, pm: ParamMap) -> None:
        pm.register("wconstr", len(self.ctx.mpc.constraints))

    def barriers(self, z, p, pm):
        w = pm.get(p, "wconstr")
        bars, weights = [], []
        for i, module in enumerate(self.ineq_modules):
            c = module.eval_constraint(z, p, pm)
            bars.append(_safe_barrier(c[0]))
            weights.append(self.dims.N * w[i])
        if not bars:
            return (jnp.zeros((0,), z.dtype),) * 2
        return jnp.stack(bars), jnp.stack(weights)


class GoalMpcObjective(ObjectiveComponent):
    """Legacy monolithic objective (reference ``goal_mpc_objective.py:26-61``):
    goal tracking + velocity damping + inverse-square obstacle repulsion.

    The reference version references an unregistered ``wobst`` parameter
    (``goal_mpc_objective.py:51``) — here it is registered properly. The
    control-penalty term of the reference variant is provided by the shared
    assembly (wu), not duplicated here.
    """

    name = "GoalMpcObjective"

    def __init__(self, ctx: ModelContext):
        super().__init__(ctx)
        dims = self.dims
        n_obst_rows = dims.n_obst * len(ctx.collision_links)
        self.n_res = dims.m + (dims.nx - dims.n) + n_obst_rows

    def register_params(self, pm: ParamMap) -> None:
        pm.register("wvel", self.dims.nx - self.dims.n)
        pm.register("w", self.dims.m)
        if self.dims.ns > 0:
            pm.register("ws", 1)
        pm.register("g", self.dims.m)
        pm.register("wobst", 1)

    def residuals(self, z, p, pm):
        dims = self.dims
        q, _, _ = dims.extract_variables(z)
        vel = z[..., dims.n : dims.nx]
        pos_ee = self.ctx.kin.fk_pos(q, self.ctx.robot.end_link)[: dims.m]
        goal_res = pos_ee - pm.get(p, "g")
        if "obst" in pm:
            # inverse-square repulsion: residual 1/d with weight wobst
            inv = 1.0 / _safe_barrier(obstacle_distances(self.ctx, q, p, pm))
        else:
            inv = jnp.zeros((self.n_res - dims.m - vel.shape[-1],), z.dtype)
        res = jnp.concatenate([goal_res, vel, inv])
        wobst = jnp.broadcast_to(pm.get(p, "wobst"), inv.shape)
        w = jnp.concatenate([pm.get(p, "w"), pm.get(p, "wvel"), wobst])
        return res, w


OBJECTIVE_REGISTRY = {
    cls.name: cls for cls in (GoalReaching, ConstraintAvoidance, GoalMpcObjective)
}

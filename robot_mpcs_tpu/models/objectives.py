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
    safe_barrier as _safe_barrier,
)
from robot_mpcs_tpu.models.params import ParamMap


class GoalReaching(ObjectiveComponent):
    """``(fk_ee(q) - goal)' diag(wgoal) (fk_ee(q) - goal)``
    (reference ``goal_reaching.py:19-33``)."""

    name = "GoalReaching"

    def __init__(self, ctx: ModelContext):
        super().__init__(ctx)
        self.n_res = self.n_res_q = self.dims.m

    def register_params(self, pm: ParamMap) -> None:
        pm.register("goal", self.dims.m)
        pm.register("wgoal", self.dims.m)

    def residuals_q(self, q, p, pm):
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
        # family split follows the module whose first row is penalized; the
        # q-family rows come first in the canonical [q; affine] row order
        self._mods_q = [(i, m) for i, m in enumerate(self.ineq_modules) if m.q_dependent]
        self._mods_aff = [(i, m) for i, m in enumerate(self.ineq_modules) if not m.q_dependent]
        self.n_bar = len(self.ineq_modules)
        self.n_bar_q = len(self._mods_q)
        self.n_bar_aff = len(self._mods_aff)

    def register_params(self, pm: ParamMap) -> None:
        pm.register("wconstr", len(self.ctx.mpc.constraints))

    def _collect(self, mods, first_rows, p, pm, dtype):
        w = pm.get(p, "wconstr")
        # RAW first rows — the barrier clamp (components.BARRIER_EPS) is
        # applied by the consumer so affine rows keep a constant Jacobian
        bars = list(first_rows)
        weights = [self.dims.N * w[i] for i, _ in mods]
        if not bars:
            return (jnp.zeros((0,), dtype),) * 2
        return jnp.stack(bars), jnp.stack(weights)

    def barriers_q(self, q, p, pm):
        rows = [m.eval_constraint_q(q, p, pm)[0] for _, m in self._mods_q]
        return self._collect(self._mods_q, rows, p, pm, q.dtype)

    def barriers_aff(self, z, p, pm):
        rows = [m.eval_constraint(z, p, pm)[0] for _, m in self._mods_aff]
        return self._collect(self._mods_aff, rows, p, pm, z.dtype)


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
        self.n_res_q = dims.m + n_obst_rows
        self.n_res_aff = dims.nx - dims.n

    def register_params(self, pm: ParamMap) -> None:
        pm.register("wvel", self.dims.nx - self.dims.n)
        pm.register("w", self.dims.m)
        if self.dims.ns > 0:
            pm.register("ws", 1)
        pm.register("g", self.dims.m)
        pm.register("wobst", 1)

    def residuals_q(self, q, p, pm):
        dims = self.dims
        pos_ee = self.ctx.kin.fk_pos(q, self.ctx.robot.end_link)[: dims.m]
        goal_res = pos_ee - pm.get(p, "g")
        if "obst" in pm:
            # inverse-square repulsion: residual 1/d with weight wobst
            inv = 1.0 / _safe_barrier(obstacle_distances(self.ctx, q, p, pm))
        else:
            inv = jnp.zeros((self.n_res_q - dims.m,), q.dtype)
        wobst = jnp.broadcast_to(pm.get(p, "wobst"), inv.shape)
        return (
            jnp.concatenate([goal_res, inv]),
            jnp.concatenate([pm.get(p, "w"), wobst]),
        )

    def residuals_aff(self, z, p, pm):
        vel = z[..., self.dims.n : self.dims.nx]
        return vel, pm.get(p, "wvel")


OBJECTIVE_REGISTRY = {
    cls.name: cls for cls in (GoalReaching, ConstraintAvoidance, GoalMpcObjective)
}

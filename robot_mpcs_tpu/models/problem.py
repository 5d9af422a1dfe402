"""MPC problem assembly: the TPU-native ``MpcModel``.

Mirrors the role of reference ``robotmpcs/models/mpcModel.py`` (and
``diff_drive_mpc_model.py``): given a parsed setup, build

* the kinematics + dimensions,
* the inequality/objective component stacks (in config order — this fixes
  the ``paramMap`` parameter ABI, see ``params.py``),
* the stage cost / stage inequality / discrete dynamics functions consumed
  by the solver,
* the variable bounds (default box +-100 as in ``mpcModel.py:23-27``),

and persist/load the offline "solver artifact" directory
(``generate_solver``), replacing ForcesPro codegen with ahead-of-time
``jax.jit`` compilation plus serialized problem metadata
(paramMap.yaml / properties.yaml exactly as ``mpcModel.py:132-141``).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np
import yaml

from robot_mpcs_tpu.assets import builtin_model
from robot_mpcs_tpu.config import Setup, SolverConfiguration
from robot_mpcs_tpu.models.components import ModelContext
from robot_mpcs_tpu.models.dimensions import ProblemDimensions
from robot_mpcs_tpu.models.dynamics import make_discrete_dynamics
from robot_mpcs_tpu.models.fk import RobotKinematics
from robot_mpcs_tpu.models.inequalities import INEQUALITY_REGISTRY
from robot_mpcs_tpu.models.objectives import OBJECTIVE_REGISTRY, ConstraintAvoidance
from robot_mpcs_tpu.models.params import ParamMap
from robot_mpcs_tpu.models.urdf import UrdfModel, load_urdf


class MpcProblem:
    """A fully-assembled, trace-ready MPC problem for one robot/config."""

    def __init__(self, setup: Setup, urdf_model: Optional[UrdfModel] = None):
        self.setup = setup
        self.mpc = setup.mpc
        self.robot = setup.robot
        if urdf_model is None:
            urdf_model = self._resolve_urdf(setup.robot.urdf_file)
        self.urdf_model = urdf_model
        self.kin = RobotKinematics(
            urdf_model, self.robot.root_link, self.robot.end_link, self.robot.base_type
        )
        self.dims = ProblemDimensions.build(
            n_arm=self.kin.n_arm,
            base_type=self.robot.base_type,
            N=self.mpc.time_horizon,
            slack=self.mpc.slack,
            n_obst=self.mpc.number_obstacles,
        )
        if self.dims.n != self.mpc.n:
            raise ValueError(
                f"config mpc.n = {self.mpc.n} does not match URDF-derived n = {self.dims.n}"
            )
        self.ctx = ModelContext(self.dims, self.kin, self.mpc, self.robot)

        # --- components + parameter registration (order = ABI) ------------
        # Reference order (mpcModel.py:29-36 + ObjectiveManager.py:14):
        # constraints (config order) -> "wu" -> objectives (config order).
        self.param_map = ParamMap()
        self.ineq_components = []
        for name in self.mpc.constraints:
            comp = INEQUALITY_REGISTRY[name](self.ctx)
            comp.register_params(self.param_map)
            self.ineq_components.append(comp)
        self.param_map.register("wu", self.dims.nu)
        if self.mpc.slack:
            # ws is read by the objective assembly when ns > 0
            # (ObjectiveManager.py:38-41); registered here since the modern
            # objective set never registers it (reference gap).
            self.param_map.register("ws", 1)
        self.obj_components = []
        for name in self.mpc.objectives:
            cls = OBJECTIVE_REGISTRY[name]
            if cls is ConstraintAvoidance:
                comp = cls(self.ctx, self.ineq_components)
            else:
                comp = cls(self.ctx)
            comp.register_params(self.param_map)
            self.obj_components.append(comp)

        self.n_ineq = sum(c.n_ineq for c in self.ineq_components)

        # --- bounds (mpcModel.py:23-27, 91-104) ----------------------------
        self.limits = {
            "x": {"low": np.full(self.dims.nx, -100.0), "high": np.full(self.dims.nx, 100.0)},
            "u": {"low": np.full(self.dims.nu, -100.0), "high": np.full(self.dims.nu, 100.0)},
            "s": {"low": np.zeros(1), "high": np.full(1, np.inf)},
        }

        self.dt = self.mpc.time_step
        self.dynamics = make_discrete_dynamics(
            self.dims,
            self.dt,
            integrator=setup.solver.integrator,
            substeps=setup.solver.integrator_substeps,
        )

    @staticmethod
    def _resolve_urdf(urdf_file: str) -> UrdfModel:
        """Load a URDF path, or fall back to a builtin robot by stem name."""
        if os.path.exists(urdf_file):
            return load_urdf(urdf_file)
        stem = os.path.splitext(os.path.basename(urdf_file))[0]
        for candidate in (stem, stem.replace("_fk", "")):
            try:
                return builtin_model(candidate)
            except KeyError:
                pass
        raise FileNotFoundError(f"URDF {urdf_file!r} not found and not a builtin robot")

    # ------------------------------------------------------------------ API

    def set_limits(self, limits: Dict[str, Dict[str, np.ndarray]]) -> None:
        """Override variable bounds (reference ``setLimits``, mpcModel.py:62-63)."""
        self.limits.update(limits)

    @property
    def npar(self) -> int:
        return self.param_map.npar

    @property
    def solver_name(self) -> str:
        """Solver directory name, minted exactly like ``mpcModel.py:111-116``
        so reference-named artifacts interoperate."""
        name = (
            f"{self.mpc.model_name}_n{self.dims.n}_"
            f"{str(self.dt).replace('.', '')}_H{self.dims.N}"
        )
        if not self.mpc.slack:
            name += "_noSlack"
        return name

    def properties(self) -> Dict:
        """The properties.yaml payload (reference ``mpcModel.py:134``)."""
        return {
            "nx": self.dims.nx,
            "nu": self.dims.nu,
            "npar": self.npar,
            "ns": self.dims.ns,
            "m": self.dims.m,
            "constraints": list(self.mpc.constraints),
        }

    # --------------------------------------------------- stage functions

    def stage_objective(self, z: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """Total stage cost: modules + u'diag(wu)u + ws s^2
        (reference ``ObjectiveManager.eval_objectives``, :28-42).
        Terminal cost is identical (``eval_objectiveN``, :44-46)."""
        pm = self.param_map
        total = jnp.zeros((), dtype=z.dtype)
        for comp in self.obj_components:
            total = total + comp.eval_objective(z, p, pm)
        _, s, u = self.dims.split_z(z)
        total = total + jnp.sum(pm.get(p, "wu") * u * u)
        if self.dims.ns > 0:
            total = total + pm.get(p, "ws")[0] * s[0] ** 2
        return total

    def stage_inequalities(self, z: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """Concatenated module inequalities, slack-shifted when ns > 0
        (the documented intent of ``InequalityManager.eval_inequalities``)."""
        pm = self.param_map
        rows = [c.eval_constraint(z, p, pm) for c in self.ineq_components]
        out = (
            jnp.concatenate(rows)
            if rows
            else jnp.zeros((0,), dtype=z.dtype)
        )
        if self.dims.ns > 0:
            out = out + z[self.dims.nx]
        return out

    # ----------------------------------------------------- solver wiring

    def bound_rows(self) -> List:
        """Static list of finite bound rows folded into the AL constraint
        stack: (index into z, sign, bound). Mirrors the lb/ub stacking of
        ``mpcModel.py:91-104``; infinite bounds are dropped at trace time."""
        dims = self.dims
        lb = np.concatenate(
            [self.limits["x"]["low"]]
            + ([self.limits["s"]["low"]] if dims.ns else [])
            + [self.limits["u"]["low"]]
        )
        ub = np.concatenate(
            [self.limits["x"]["high"]]
            + ([self.limits["s"]["high"]] if dims.ns else [])
            + [self.limits["u"]["high"]]
        )
        rows = []
        for i in range(dims.nz):
            if np.isfinite(lb[i]):
                rows.append((i, +1.0, float(lb[i])))  # z_i - lb >= 0
            if np.isfinite(ub[i]):
                rows.append((i, -1.0, float(ub[i])))  # ub - z_i >= 0
        return rows

    @property
    def n_con(self) -> int:
        """Total AL constraint rows per stage (module ineqs + bound rows)."""
        return self.n_ineq + len(self.bound_rows())

    @property
    def n_res(self) -> int:
        """Residual rows per stage: objective residuals + control penalty
        rows (wu) + slack penalty row (ws)."""
        return sum(c.n_res for c in self.obj_components) + self.dims.nu + self.dims.ns

    @property
    def n_bar(self) -> int:
        """Barrier rows per stage (inverse-clearance repulsion terms)."""
        return sum(c.n_bar for c in self.obj_components)

    # ------------------------------------------------ split row families

    def split_callbacks(self):
        """Build the two-family structured stage callbacks for the solver.

        Rows are partitioned by what they depend on:

        * **q family** — rows that reach z only through the configuration
          ``q = z[:n]`` (forward kinematics): goal residuals, obstacle /
          self-collision / halfplane constraint rows and their barriers.
          The solver differentiates these with just ``n`` tangents.
        * **affine family** — rows affine in z with a *constant* Jacobian
          (limits, bounds, control/slack penalty rows, velocity damping).
          Their Jacobian ``S_aff`` is computed once here at build time; the
          solver's Gauss-Newton assembly for them reduces to static GEMMs.

        Returns a dict consumed by ``build_solver``. Constraint-row order
        (the multiplier ABI) is ``[q-family module rows in config order;
        affine module rows in config order; bound rows]``.
        """
        import jax

        from robot_mpcs_tpu.utils.devices import local_cpu_device

        dims = self.dims
        pm = self.param_map
        rows = self.bound_rows()
        b_idx = np.array([r[0] for r in rows], dtype=np.int32)
        b_sign = np.array([r[1] for r in rows], dtype=np.float32)
        b_bnd = np.array([r[2] for r in rows], dtype=np.float32)

        ineq_q = [c for c in self.ineq_components if c.q_dependent]
        ineq_aff = [c for c in self.ineq_components if not c.q_dependent]
        n_con_q = sum(c.n_ineq for c in ineq_q)
        n_con_aff = sum(c.n_ineq for c in ineq_aff) + len(rows)
        n_res_q = sum(c.n_res_q for c in self.obj_components)
        n_res_aff = (
            sum(c.n_res_aff for c in self.obj_components) + dims.nu + dims.ns
        )
        n_bar_q = sum(c.n_bar_q for c in self.obj_components)
        n_bar_aff = sum(c.n_bar_aff for c in self.obj_components)

        def q_rows(q, p):
            """[res_q; bar_q; con_q] — all FK-dependent rows, q tangents only.

            Constraint rows here are UNSHIFTED; when ns > 0 the solver adds
            the slack variable to them (constant unit Jacobian column)."""
            res = [c.residuals_q(q, p, pm)[0] for c in self.obj_components]
            bar = [c.barriers_q(q, p, pm)[0] for c in self.obj_components]
            con = [c.eval_constraint_q(q, p, pm) for c in ineq_q]
            parts = res + bar + con
            return (
                jnp.concatenate(parts)
                if parts
                else jnp.zeros((0,), q.dtype)
            )

        def aff_rows(z, p):
            """[res_aff; bar_aff; con_aff] — rows affine in z (slack shift of
            module constraint rows included; bound rows are not shifted,
            mirroring the reference's lb/ub handling, mpcModel.py:91-104)."""
            res = [c.residuals_aff(z, p, pm)[0] for c in self.obj_components]
            res.append(z[dims.nx + dims.ns :])  # u rows (weight wu)
            if dims.ns:
                res.append(z[dims.nx : dims.nx + dims.ns])  # slack row (ws)
            bar = [c.barriers_aff(z, p, pm)[0] for c in self.obj_components]
            con = [c.eval_constraint(z, p, pm) for c in ineq_aff]
            if dims.ns and con:
                s = z[dims.nx]
                con = [c + s for c in con]
            if len(rows):
                con.append(b_sign * (z[b_idx] - b_bnd))
            parts = res + bar + con
            return (
                jnp.concatenate(parts)
                if parts
                else jnp.zeros((0,), z.dtype)
            )

        def weights_split(p):
            """(w_res_q, w_bar_q, w_res_aff, w_bar_aff); weight vectors
            depend on p only, so evaluating the components at 0 is exact."""
            q0 = jnp.zeros((dims.n,), p.dtype)
            z0 = jnp.zeros((dims.nz,), p.dtype)
            wrq = [c.residuals_q(q0, p, pm)[1] for c in self.obj_components]
            wbq = [c.barriers_q(q0, p, pm)[1] for c in self.obj_components]
            wra = [c.residuals_aff(z0, p, pm)[1] for c in self.obj_components]
            wra.append(pm.get(p, "wu"))
            if dims.ns:
                wra.append(pm.get(p, "ws"))
            wba = [c.barriers_aff(z0, p, pm)[1] for c in self.obj_components]
            cat = lambda xs: (
                jnp.concatenate(xs) if xs else jnp.zeros((0,), p.dtype)
            )
            return cat(wrq), cat(wbq), cat(wra), cat(wba)

        # constant affine Jacobian, computed once (p enters rows only as
        # offsets; verified by tests/test_problem.py::test_affine_jacobian)
        # build-time constant on the CPU backend: the eager jacfwd's tiny
        # ops each compile their own TPU mini-program otherwise
        with jax.default_device(local_cpu_device()):
            p0 = jnp.zeros((self.npar,), jnp.float32)
            S_aff = np.asarray(
                jax.jacfwd(lambda z: aff_rows(z, p0))(
                    jnp.zeros((dims.nz,), jnp.float32)
                )
            )

        return {
            "q_rows": q_rows,
            "aff_rows": aff_rows,
            "weights_split": weights_split,
            "S_aff": S_aff,
            "q_seg": (n_res_q, n_bar_q, n_con_q),
            "aff_seg": (n_res_aff, n_bar_aff, n_con_aff),
            "n_q": dims.n,
        }

    def solver_callbacks(self):
        """StageFunctions in the solver's (x, w, p) calling convention with
        w = [s, u], plus (w_lb, w_ub) clamp bounds.

        ``values`` stacks [residuals; barriers; constraints] so the solver
        gets the whole Gauss-Newton structure from one Jacobian pass; shared
        subexpressions (FK) are deduplicated by XLA CSE.
        """
        from robot_mpcs_tpu.solver.al_ilqr import StageFunctions

        dims = self.dims
        pm = self.param_map
        rows = self.bound_rows()
        idx = np.array([r[0] for r in rows], dtype=np.int32)
        sign = np.array([r[1] for r in rows], dtype=np.float32)
        bnd = np.array([r[2] for r in rows], dtype=np.float32)

        def cost(x, w, p):
            z = jnp.concatenate([x, w])
            return self.stage_objective(z, p)

        def ineq(x, w, p):
            z = jnp.concatenate([x, w])
            mod = self.stage_inequalities(z, p)
            if len(rows) == 0:
                return mod
            b = sign * (z[idx] - bnd)
            return jnp.concatenate([mod, b])

        def values(x, w, p):
            z = jnp.concatenate([x, w])
            res = [comp.residuals(z, p, pm)[0] for comp in self.obj_components]
            res.append(z[dims.nx + dims.ns :])  # u rows (weight wu)
            if dims.ns:
                res.append(z[dims.nx : dims.nx + dims.ns])  # slack row (weight ws)
            bars = [comp.barriers(z, p, pm)[0] for comp in self.obj_components]
            return jnp.concatenate(res + bars + [ineq(x, w, p)])

        def weights(p):
            w_res = [comp.residuals(jnp.zeros(dims.nz, p.dtype), p, pm)[1]
                     if comp.n_res else jnp.zeros((0,), p.dtype)
                     for comp in self.obj_components]
            # the weight vectors depend on p only; evaluating at z=0 is exact
            w_res.append(pm.get(p, "wu"))
            if dims.ns:
                w_res.append(pm.get(p, "ws"))
            w_bar = [comp.barriers(jnp.zeros(dims.nz, p.dtype), p, pm)[1]
                     if comp.n_bar else jnp.zeros((0,), p.dtype)
                     for comp in self.obj_components]
            return jnp.concatenate(w_res), (
                jnp.concatenate(w_bar) if w_bar else jnp.zeros((0,), p.dtype)
            )

        from robot_mpcs_tpu.models.dynamics import constant_dynamics_jacobians

        dyn_jac = constant_dynamics_jacobians(dims, self.dynamics)

        w_lb = np.concatenate(
            ([self.limits["s"]["low"]] if dims.ns else []) + [self.limits["u"]["low"]]
        )
        w_ub = np.concatenate(
            ([self.limits["s"]["high"]] if dims.ns else []) + [self.limits["u"]["high"]]
        )
        stage = StageFunctions(
            dynamics=self.dynamics,
            cost=cost,
            ineq=ineq,
            values=values,
            weights=weights,
            dyn_jac=dyn_jac,
        )
        return stage, w_lb.astype(np.float32), w_ub.astype(np.float32)

    def build_solver(self, cfg: Optional[SolverConfiguration] = None) -> Callable:
        """Build the batched NLP solve function for this problem."""
        from robot_mpcs_tpu.solver.al_ilqr import build_solver

        stage, w_lb, w_ub = self.solver_callbacks()
        split = self.split_callbacks()
        stage = stage._replace(
            q_rows=split["q_rows"],
            aff_rows=split["aff_rows"],
            weights_split=split["weights_split"],
        )
        return build_solver(
            stage,
            nx=self.dims.nx,
            ns=self.dims.ns,
            nu=self.dims.nu,
            N=self.dims.N,
            n_con=self.n_con,
            n_res=self.n_res,
            n_bar=self.n_bar,
            w_lb=w_lb,
            w_ub=w_ub,
            cfg=cfg or self.setup.solver,
            n_q=split["n_q"],
            q_seg=split["q_seg"],
            aff_seg=split["aff_seg"],
            S_aff=split["S_aff"],
        )

    # ----------------------------------------------------- artifact I/O

    def generate_solver(self, location: str = "./", export: bool = True) -> str:
        """Persist the solver artifact directory (reference
        ``generateSolver``, mpcModel.py:128-141): paramMap.yaml +
        properties.yaml + the full setup, plus (``export=True``) the
        serialized traced-and-lowered B=1 planner program
        (``jax.export``) — the analog of the compiled solver library the
        reference emits next to its yamls. Returns the artifact path.

        A loading process with the export present skips Python tracing
        entirely; the XLA compile is served by the persistent compilation
        cache. Without it, compilation happens via ``jax.jit`` at first
        use.
        """
        path = os.path.join(location, self.solver_name)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "paramMap.yaml"), "w") as f:
            yaml.dump(self.param_map.to_reference_dict(), f, default_flow_style=False)
        with open(os.path.join(path, "properties.yaml"), "w") as f:
            yaml.dump(self.properties(), f, default_flow_style=False)
        with open(os.path.join(path, "setup.yaml"), "w") as f:
            yaml.dump(self.setup.to_dict(), f, default_flow_style=False)
        if export:
            from robot_mpcs_tpu.utils.aot import export_planner_solve

            export_planner_solve(self, path, batch=1)
        return path

    @classmethod
    def from_solver_dir(cls, path: str) -> "MpcProblem":
        """Rebuild a problem from a persisted artifact directory."""
        with open(os.path.join(path, "setup.yaml")) as f:
            setup = Setup.from_dict(yaml.safe_load(f))
        problem = cls(setup)
        # verify the persisted ABI matches the rebuilt one
        with open(os.path.join(path, "paramMap.yaml")) as f:
            persisted = yaml.safe_load(f)
        if persisted != problem.param_map.to_reference_dict():
            raise ValueError(f"paramMap mismatch loading artifact {path}")
        return problem

"""Batched fleet execution: thousands of closed-loop MPC scenarios on-device.

This is the throughput workhorse (BASELINE.md: >= 10k solves/s target): one
jitted ``fleet_step`` advances every scenario by one control step — batched
AL-iLQR solve, action extraction, plant integration, shift-horizon warm start
— with all state resident on device and the batch axis sharded over the mesh.
The only host traffic per step is the aggregated metrics scalar bundle.

Contrast with the reference: its planner solves ONE scenario per Python call
through a C FFI boundary (``mpcPlanner.py:240-288``) and has no batching at
all; this module is the TPU-native replacement for "run a fleet of robots".
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax

from robot_mpcs_tpu.utils.devices import local_cpu_device
import jax.numpy as jnp
import numpy as np

from robot_mpcs_tpu.config import SolverConfiguration
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch


class FleetScenario(NamedTuple):
    """Batched scenario definition: initial states + per-stage parameters."""

    xinit: jnp.ndarray  # (B, nx)
    params: jnp.ndarray  # (B, N, npar)


class FleetState(NamedTuple):
    """Device-resident per-scenario state carried across control steps."""

    x: jnp.ndarray  # (B, nx) plant state
    z_warm: jnp.ndarray  # (B, N, nz) warm-start trajectory
    lam: jnp.ndarray  # (B, N, n_con) AL multipliers
    step: jnp.ndarray  # () int32
    #: (B,) int32 — consecutive control steps each lane has ended unconverged
    #: (exitflag != 1). Drives the stall-recovery cold restart: a lane whose
    #: warm start has gone bad (poisoned multipliers / trajectory in a flat
    #: basin) keeps re-stalling every step; restarting it cold from the
    #: current plant state recovers most such lanes (measured in
    #: scripts/dissect_tail_r4.py: 7 of 9 persistent stalls converge from a
    #: cold start with the same budget).
    stall: jnp.ndarray
    #: (B,) best goal distance each lane has ever reached — the reference
    #: point of the local-minimum escape (see FleetRunner kick_*)
    best_gdist: jnp.ndarray
    #: (B,) int32 — consecutive steps without improving best_gdist
    no_improve: jnp.ndarray


class FleetMetrics(NamedTuple):
    #: fraction of solves that genuinely converged (exitflag == 1: feasible
    #: to tol_constraint AND stationary to tol_gradient). NOT "didn't blow
    #: up" — that is ``1 - reset_fraction``.
    converged_fraction: jnp.ndarray
    mean_cost: jnp.ndarray
    max_violation: jnp.ndarray
    #: violation reported PER EXITFLAG CLASS: the batch max over converged
    #: (exitflag == 1) lanes vs over budget-exhausted (exitflag == 0) lanes.
    #: ``max_violation`` alone conflates the two — its headline number is
    #: dominated by the unconverged tail while converged lanes sit at
    #: <= tol_constraint, so it cannot distinguish "solver quality" from
    #: "tail size".
    max_violation_converged: jnp.ndarray
    max_violation_unconverged: jnp.ndarray
    mean_goal_distance: jnp.ndarray
    #: fraction of scenarios whose warm start was reset this step because the
    #: solve came back unusable (diverged / heavily violated)
    reset_fraction: jnp.ndarray
    #: inner iLQR iterations actually used, averaged / maxed over the batch
    #: (the per-solve cost signal the reference's unread ForcesPro ``info``
    #: struct carried, reference mpcPlanner.py:262 — here it is first-class)
    mean_iterations: jnp.ndarray
    max_iterations: jnp.ndarray
    #: fraction of unconverged lanes that did NOT get a rescue re-solve this
    #: step because their shard had more bad lanes than rescue slots
    #: (top_k capacity overflow). Nonzero values mean the straggler
    #: compaction is silently under-provisioned — raise ``compaction_ratio``
    #: capacity or the phase-1 budget.
    rescue_overflow_fraction: jnp.ndarray
    #: max RAW stage-0 violation over the batch (see
    #: SolveResult.violation0_raw): detects lanes whose CURRENT state already
    #: violates a state-only constraint (e.g. an in-collision start) — the
    #: solver masks those rows (nothing it can do about data), but a safety
    #: monitor must still see them.
    max_violation0_raw: jnp.ndarray


class FleetRunner:
    """Runs B scenarios of one problem class in lockstep on the mesh.

    **Straggler compaction** (on by default for large batches): a batched
    ``while_loop`` runs in lockstep, so one hard lane pins the whole batch
    at the worst-case iteration budget even when 97% of lanes converged in
    a third of it. The fleet therefore solves in two phases: phase 1 runs
    every lane with a short outer budget (``phase1_al_iterations``), then
    the unconverged lanes of each device shard are gathered into a
    ``1/compaction_ratio``-size sub-batch and re-solved (warm) with the
    full budget. Stragglers get MORE total iterations than before while
    the full-width batch pays far fewer lockstep trips. The gather/scatter
    is per device shard (grouped reshape), so no cross-chip collectives
    are introduced. Set ``compaction_ratio=0`` to disable.
    """

    def __init__(
        self,
        problem: MpcProblem,
        batch_size: int,
        mesh=None,
        solver_cfg: Optional[SolverConfiguration] = None,
        compaction_ratio: int = 8,
        phase1_al_iterations: int = 2,
        rescue_tiers=None,
        stall_reset_after: int = 3,
        kick_after: int = 25,
        kick_gdist: float = 0.15,
        kick_scale: float = 1.0,
        artifact_dir: Optional[str] = None,
    ):
        """``rescue_tiers``: optional cascade of straggler-rescue passes,
        each ``(capacity_ratio, max_al_iterations, max_ilqr_iterations)`` —
        tier t re-solves (warm) each shard's worst still-unconverged lanes
        in a ``1/capacity_ratio``-width sub-batch with its own iteration
        budget. Deeper tiers are narrower and richer, so pathological lanes
        pin only a narrow batch's while_loop instead of the full fleet.
        Default: one tier at ``(compaction_ratio, base max_al, base
        max_ilqr)`` (the classic two-phase schedule).

        ``stall_reset_after``: cold-restart the warm start of any lane that
        ends >= this many CONSECUTIVE control steps unconverged (0 disables).
        Persistent stalls are warm-start pathologies: measured on the panda
        fleet, 7 of 9 lanes that never converge warm do converge cold
        (scripts/dissect_tail_r4.py).

        ``kick_after``/``kick_gdist``/``kick_scale``: local-minimum escape.
        A lane whose SOLVER converges but whose goal distance has not
        improved for ``kick_after`` consecutive steps while still
        ``> kick_gdist`` away is parked in a local minimum of the nonconvex
        problem (typically orbiting an obstacle barrier — short-horizon
        local MPC cannot see around it; the reference's single-scenario
        planner has the identical failure mode and no answer to it). Such
        lanes get a randomized warm-start kick: zero-mean noise of scale
        ``kick_scale`` (control units) on the shifted control trajectory
        plus a multiplier reset — a random restart into a different basin,
        re-attempted every ``kick_after`` steps until the lane improves.
        ``kick_scale=0`` disables.
        """
        # fleet_step is a large XLA program (minutes cold on TPU with the
        # scalarized solver graphs); persistent-cache it like the planner
        from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        self.problem = problem
        self.dims = problem.dims
        self.batch = batch_size
        self.mesh = mesh if mesh is not None else make_mesh()
        if batch_size % self.mesh.devices.size != 0:
            raise ValueError(
                f"batch {batch_size} not divisible by mesh size {self.mesh.devices.size}"
            )
        base_cfg = solver_cfg if solver_cfg is not None else problem.setup.solver
        self._n_groups = self.mesh.devices.size
        b_loc = batch_size // self._n_groups
        self._stall_reset_after = int(stall_reset_after)
        self._kick_after = int(kick_after)
        self._kick_gdist = float(kick_gdist)
        self._kick_scale = float(kick_scale)

        import dataclasses

        if rescue_tiers is None:
            # Production default from the round-5 v5e sweep
            # (scripts/sweep_tiers_r5.py, B=4096 panda): a 1/8-width rescue
            # with a 1.25x budget and a 4-deep backtracking line search
            # converges the tail the single-probe LM search cannot polish —
            # 61.3k solves/s/chip @ converged 0.966 (the quality acceptance
            # bar is >= 0.95, VERDICT r4). The frontier, for retuning:
            # (8,4,8,1) 77.2k @ 0.907; (8,5,10,2) 66.5k @ 0.959 (thin
            # margin + a diverging rescue lane — rejected); (8,4,10,4)
            # 65.7k @ 0.937 (below bar); (8,5,10,4) 61.3k @ 0.966;
            # (8,6,12,4) 54.7k @ 0.980; (8,6,12,8) 45.9k @ 0.982;
            # (6,6,12,8) 37.7k @ 0.994 overflow 0; (4,6,12,8) 33.4k @ 0.995.
            # Quality-first alternative: the mop-up cascade
            # [(8,5,10,4), (16,5,10,4)] reaches 52.6k @ 0.9915 with ZERO
            # rescue overflow — pass it explicitly when the tail matters
            # more than ~15% throughput.
            rescue_tiers = (
                [(
                    compaction_ratio,
                    max(5, base_cfg.max_al_iterations),
                    max(10, base_cfg.max_ilqr_iterations),
                    max(4, base_cfg.line_search_steps),
                )]
                if compaction_ratio
                else []
            )
        # clip each tier to the slots its shard actually has; drop tiers
        # with fewer than 8 slots (sub-sublane gathers aren't worth a
        # separate compiled solver) — NOT silently: warn, because lanes that
        # would have been rescued now simply run phase 1's budget only.
        tiers = []
        tier_spec = []
        for tier in rescue_tiers:
            # (ratio, al, ilqr[, line_search_steps]) — a deeper line search
            # in the narrow rescue batch costs little (merit sweeps at B/8)
            # and converges feasible-but-barely-nonstationary lanes that the
            # single-probe LM search polishes only slowly
            ratio, al_it, ilqr_it = tier[:3]
            ls = tier[3] if len(tier) > 3 else base_cfg.line_search_steps
            k_loc = b_loc // int(ratio)
            if k_loc < 8:
                import warnings

                warnings.warn(
                    f"FleetRunner: rescue tier 1/{ratio} disabled — "
                    f"per-device batch {b_loc} yields {k_loc} < 8 rescue "
                    f"slots. Affected lanes run the remaining tiers (or "
                    f"phase 1 only). Pass compaction_ratio=0 / "
                    f"rescue_tiers=[] to silence.",
                    stacklevel=2,
                )
                continue
            cfg_t = dataclasses.replace(
                base_cfg,
                max_al_iterations=int(al_it),
                max_ilqr_iterations=int(ilqr_it),
                line_search_steps=int(ls),
            )
            tiers.append((k_loc, problem.build_solver(cfg_t)))
            tier_spec.append((int(ratio), int(al_it), int(ilqr_it), int(ls)))
        self._tiers = tiers
        #: resolved tier schedule (ratio, al, ilqr, ls) — part of the AOT
        #: artifact fingerprint (utils/aot.py)
        self._tier_spec = tier_spec
        self._k_loc = tiers[0][0] if tiers else 0  # back-compat (tests)
        if tiers:
            cfg1 = dataclasses.replace(
                base_cfg,
                max_al_iterations=min(
                    phase1_al_iterations, base_cfg.max_al_iterations
                ),
            )
            self._solve = problem.build_solver(cfg1)
        else:
            self._solve = problem.build_solver(base_cfg)
        self._plant = problem.dynamics  # plant = model (kinematic fidelity)
        pm = problem.param_map
        self._has_goal = "goal" in pm.entries
        kin, end_link = problem.kin, problem.robot.end_link
        self._fk_ee = lambda q: kin.fk_pos(q, end_link)

        dims = self.dims
        nu, nx, ns = dims.nu, dims.nx, dims.ns

        def post_step(
            x, res_z, res_lam, exitflag, violation, stall, params,
            best_gdist, no_improve,
        ):
            # Failure handling: a diverged/heavily-violated plan must not be
            # executed or fed back as the next warm start (the reference only
            # prints on exitflag < 0, mpcPlanner.py:263-264, and its examples
            # refuse to seed constraints from failed plans,
            # boxer_example.py:194-198). Brake (u = 0) and cold-restart.
            ok = (exitflag >= 0) & (violation < 0.5)
            u = jnp.where(ok, res_z[0, -nu:], jnp.zeros((nu,), res_z.dtype))
            x_next = self._plant(x, u)
            # Stall recovery: a lane that keeps ending unconverged step after
            # step is trapped by its own warm start (shift-propagated
            # multipliers / trajectory in a bad basin) — restart it cold.
            # The action above still executes (the plan is usable, just not
            # optimal); only the NEXT solve starts fresh.
            stall_next = jnp.where(exitflag == 1, 0, stall + 1)
            stall_reset = (
                stall_next >= self._stall_reset_after
                if self._stall_reset_after > 0
                else jnp.asarray(False)
            )
            stall_next = jnp.where(stall_reset, 0, stall_next)
            keep_warm = ok & ~stall_reset
            # shift-horizon warm start (reference mpcPlanner.py:215-226)
            cold = jnp.zeros_like(res_z).at[:, :nx].set(x_next)
            z_shift = jnp.where(
                keep_warm, jnp.concatenate([res_z[1:], res_z[-1:]], axis=0), cold
            )
            lam_shift = jnp.where(
                keep_warm,
                jnp.concatenate([res_lam[1:], res_lam[-1:]], axis=0),
                jnp.zeros_like(res_lam),
            )
            q = x_next[: dims.n]
            if self._has_goal:
                goal = pm.get(params[0], "goal")
                gdist = jnp.linalg.norm(self._fk_ee(q)[: dims.m] - goal[: dims.m])
            else:
                gdist = jnp.zeros((), x.dtype)
            # local-minimum escape bookkeeping: a lane that keeps SOLVING
            # fine but whose goal distance has plateaued short of the goal
            # is parked in a nonconvex local minimum (obstacle-barrier
            # orbit) — flag it for a randomized warm-start kick
            improved = gdist < best_gdist - 5e-3
            best_new = jnp.minimum(best_gdist, gdist)
            ni_next = jnp.where(improved, 0, no_improve + 1)
            kick = (
                (ni_next >= self._kick_after)
                & (gdist > self._kick_gdist)
                & (self._kick_scale > 0.0)
                if self._has_goal and self._kick_after > 0
                else jnp.asarray(False)
            )
            ni_next = jnp.where(kick, 0, ni_next)
            lam_shift = jnp.where(kick, jnp.zeros_like(lam_shift), lam_shift)
            return (
                x_next, z_shift, lam_shift, gdist, ~ok, stall_next,
                best_new, ni_next, kick,
            )

        def rescue_stragglers(x, params, res, solve_fn, k):
            """Gather this device's worst unconverged lanes into a compact
            k-wide sub-batch, re-solve warm with ``solve_fn``'s budget,
            scatter back. Runs on the LOCAL shard (inside shard_map), so
            every gather/scatter stays on-chip by construction. Returns the
            updated result plus local (overflow_count, bad_count) for the
            cross-device capacity telemetry."""
            G = 1
            B = x.shape[0]

            def grp(t):  # (B, ...) -> (G, B_loc, ...)
                return t.reshape((G, B // G) + t.shape[1:])

            bad = res.exitflag != 1
            # worst-first: prioritize violated lanes; non-finite lanes first
            score = bad.astype(jnp.float32) * (
                1.0 + jnp.minimum(res.violation, 1e3)
            )
            score = jnp.where(jnp.isfinite(score), score, 2e3)
            idx = jax.lax.top_k(grp(score), k)[1]  # (G, k)
            # capacity telemetry: bad lanes beyond the k rescue slots of
            # this shard are NOT re-solved this step. Report the dropped
            # counts instead of truncating silently (metric below).
            n_bad = jnp.sum(grp(bad), axis=1)  # (G,)
            overflow = jnp.sum(jnp.maximum(0, n_bad - k))
            bad_total = jnp.sum(n_bad)

            def gather(t):
                tg = grp(t)
                ii = idx.reshape(idx.shape + (1,) * (tg.ndim - 2))
                return jnp.take_along_axis(tg, ii, axis=1)

            flat = lambda t: t.reshape((G * k,) + t.shape[2:])
            x_g = flat(gather(x))
            z_g = flat(gather(res.z))
            lam_g = flat(gather(res.lam))
            # Sanitize non-finite warm starts: a diverged (NaN) lane
            # re-solved FROM its NaN z/lam is guaranteed to fail again (no
            # step is ever accepted against a NaN merit) and would burn the
            # whole rescue budget. Restart those lanes cold from the plant
            # state with zeroed multipliers.
            finite = jnp.all(jnp.isfinite(z_g), axis=(1, 2)) & jnp.all(
                jnp.isfinite(lam_g), axis=(1, 2)
            )
            z_cold = jnp.zeros_like(z_g).at[:, :, :nx].set(x_g[:, None, :])
            z_g = jnp.where(finite[:, None, None], z_g, z_cold)
            lam_g = jnp.where(finite[:, None, None], lam_g, 0.0)
            res2 = jax.vmap(solve_fn)(
                x_g, flat(gather(params)), z_g, lam_g
            )
            replace = gather(bad)  # (G, k): only overwrite genuinely bad lanes

            def merge(a, b, combine=None):
                ag, bg = grp(a), b.reshape((G, k) + b.shape[1:])
                rep = replace.reshape((G, k) + (1,) * (bg.ndim - 2))
                old = gather(a).reshape(bg.shape)
                upd = jnp.where(rep, bg if combine is None else combine(old, bg), old)
                out = jax.vmap(lambda arr, i, u: arr.at[i].set(u))(ag, idx, upd)
                return out.reshape(a.shape)

            return (
                type(res)(
                    z=merge(res.z, res2.z),
                    exitflag=merge(res.exitflag, res2.exitflag),
                    cost=merge(res.cost, res2.cost),
                    violation=merge(res.violation, res2.violation),
                    grad_norm=merge(res.grad_norm, res2.grad_norm),
                    lam=merge(res.lam, res2.lam),
                    # rescued lanes report phase-1 + phase-2 iterations
                    iterations=merge(
                        res.iterations, res2.iterations, combine=lambda o, n: o + n
                    ),
                    violation0_raw=merge(res.violation0_raw, res2.violation0_raw),
                ),
                overflow,
                bad_total,
            )

        # ---- per-device step body (runs inside shard_map) ----------------
        # Each device advances ITS shard independently: the solver's
        # batched while_loops trip-count over local lanes only (per-device
        # early exit — one slow chip no longer pins the others in
        # lockstep), the rescue gather/scatter is chip-local by
        # construction, and the ONLY cross-device communication is the
        # handful of scalar metric reductions below. Under plain
        # jit-over-sharded-arrays every while_loop condition was a
        # batch-wide reduction, i.e. one all-reduce per solver iteration —
        # free on ICI, ruinous over DCN/gloo (SCALING.md, 2-process row).
        axis = self.mesh.axis_names[0]
        B_total = float(batch_size)

        def gsum(v):
            return jax.lax.psum(v, axis)

        def gmax(v):
            return jax.lax.pmax(v, axis)

        def local_step(state: FleetState, scenario: FleetScenario):
            res = jax.vmap(self._solve)(
                state.x, scenario.params, state.z_warm, state.lam
            )
            # overflow is reported for the LAST tier: bad lanes the final
            # (widest-budget) pass had no slot for — the lanes that truly
            # went un-rescued this step
            overflow = jnp.zeros((), jnp.int32)
            bad_total = jnp.zeros((), jnp.int32)
            for k_t, solve_t in self._tiers:
                res, overflow, bad_total = rescue_stragglers(
                    state.x, scenario.params, res, solve_t, k_t
                )
            (
                x_next, z_shift, lam_shift, gdist, was_reset, stall_next,
                best_gdist, no_improve, kick,
            ) = jax.vmap(post_step)(
                state.x, res.z, res.lam, res.exitflag, res.violation,
                state.stall, scenario.params, state.best_gdist,
                state.no_improve,
            )
            # randomized restart for plateaued lanes: zero-mean control
            # noise pushes the warm start into a different basin; the next
            # solve re-optimizes from there (multipliers were already reset
            # in post_step). Key folded on (step, device) so every retry
            # and every shard draws fresh, uncorrelated noise.
            if self._kick_scale > 0.0:
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(0x5EED), state.step),
                    jax.lax.axis_index(axis),
                )
                noise = self._kick_scale * jax.random.normal(
                    key, z_shift[..., dims.nx :].shape, z_shift.dtype
                )
                z_shift = z_shift.at[..., dims.nx :].add(
                    jnp.where(kick[:, None, None], noise, 0.0)
                )
            # Reductions mask out failed lanes: one NaN lane (the exact
            # fault-injection scenario test_fleet exercises) must not poison
            # the whole-batch aggregates — reset_fraction reports the failures.
            ok = ~was_reset
            n_ok = jnp.maximum(gsum(jnp.sum(ok.astype(jnp.float32))), 1.0)

            def ok_mean(v):
                return gsum(jnp.sum(jnp.where(ok, v, 0.0))) / n_ok

            conv = res.exitflag == 1
            stalled = res.exitflag == 0

            def class_max(v, mask):
                return gmax(jnp.max(jnp.where(mask, v, 0.0)))

            ovf = gsum(overflow).astype(jnp.float32)
            metrics = FleetMetrics(
                converged_fraction=gsum(jnp.sum(conv.astype(jnp.float32)))
                / B_total,
                mean_cost=ok_mean(res.cost),
                max_violation=gmax(jnp.max(jnp.where(ok, res.violation, 0.0))),
                max_violation_converged=class_max(res.violation, conv),
                max_violation_unconverged=class_max(res.violation, stalled),
                mean_goal_distance=ok_mean(gdist),
                reset_fraction=gsum(jnp.sum(was_reset.astype(jnp.float32)))
                / B_total,
                mean_iterations=gsum(
                    jnp.sum(res.iterations.astype(jnp.float32))
                )
                / B_total,
                max_iterations=gmax(jnp.max(res.iterations)),
                rescue_overflow_fraction=ovf
                / jnp.maximum(1.0, gsum(bad_total).astype(jnp.float32)),
                max_violation0_raw=gmax(
                    jnp.max(
                        jnp.where(
                            jnp.isfinite(res.violation0_raw),
                            res.violation0_raw,
                            0.0,
                        )
                    )
                ),
            )
            new_state = FleetState(
                x=x_next, z_warm=z_shift, lam=lam_shift, step=state.step + 1,
                stall=stall_next, best_gdist=best_gdist, no_improve=no_improve,
            )
            return new_state, metrics

        from jax.sharding import PartitionSpec as P

        shard_map = getattr(jax, "shard_map", None)
        if shard_map is None:  # older jax
            from jax.experimental.shard_map import shard_map

        b = P(axis)
        r = P()
        state_specs = FleetState(
            x=b, z_warm=b, lam=b, step=r, stall=b, best_gdist=b, no_improve=b
        )
        scen_specs = FleetScenario(xinit=b, params=b)
        metric_specs = FleetMetrics(*([r] * len(FleetMetrics._fields)))
        sharded_step = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(state_specs, scen_specs),
            out_specs=(state_specs, metric_specs),
            check_vma=False,
        )

        @partial(jax.jit, donate_argnums=(0,))
        def fleet_step(state: FleetState, scenario: FleetScenario):
            return sharded_step(state, scenario)

        self._fleet_step = fleet_step

        # AOT-exported fleet step from an artifact directory, when present
        # and fingerprint-compatible (batch/mesh/tiers/recovery knobs):
        # skips the Python trace of the full fleet program in this process
        if artifact_dir is not None:
            from robot_mpcs_tpu.utils.aot import load_fleet_step

            loaded = load_fleet_step(self, artifact_dir)
            if loaded is not None:
                self._fleet_step = loaded

    # ------------------------------------------------------------ artifact

    def export_step(self, path: str):
        """Serialize this runner's compiled-shape fleet step into ``path``
        (see utils/aot.py). A future process constructing an identically
        configured FleetRunner with ``artifact_dir=path`` skips tracing."""
        from robot_mpcs_tpu.utils.aot import export_fleet_step

        return export_fleet_step(self, path)

    # ----------------------------------------------------------------- API

    def init_state(self, scenario: FleetScenario) -> FleetState:
        dims = self.dims
        B = scenario.xinit.shape[0]
        sh = batch_sharding(self.mesh)
        xinit = (
            scenario.xinit
            if isinstance(scenario.xinit, jax.Array)
            else jnp.asarray(scenario.xinit, jnp.float32)
        )
        xinit = shard_batch(self.mesh, xinit)

        # Built inside jit with explicit output shardings so it works
        # unchanged on a multi-host global mesh (eager ops on
        # non-fully-addressable arrays are not allowed). jit outputs are
        # fresh buffers, so fleet_step's donation cannot alias the caller's
        # scenario.xinit.
        @partial(jax.jit, out_shardings=(sh, sh, sh, sh, sh, sh))
        def _init(x):
            z0 = jnp.zeros((B, dims.N, dims.nz), jnp.float32)
            z0 = z0.at[:, :, : dims.nx].set(x[:, None, :])
            lam = jnp.zeros((B, dims.N, self.problem.n_con), jnp.float32)
            stall = jnp.zeros((B,), jnp.int32)
            best = jnp.full((B,), jnp.inf, jnp.float32)
            ni = jnp.zeros((B,), jnp.int32)
            return x + 0.0, z0, lam, stall, best, ni

        x, z_warm, lam, stall, best, ni = _init(xinit)
        return FleetState(
            x=x, z_warm=z_warm, lam=lam, step=jnp.zeros((), jnp.int32),
            stall=stall, best_gdist=best, no_improve=ni,
        )

    def shard_scenario(self, scenario: FleetScenario) -> FleetScenario:
        return shard_batch(self.mesh, scenario)

    def step(self, state: FleetState, scenario: FleetScenario):
        return self._fleet_step(state, scenario)

    def run(self, scenario: FleetScenario, n_steps: int, sync_every: int = 16):
        """Run the fleet for n_steps; returns (final state, last metrics).

        ``sync_every``: host-sync cadence. Unbounded async dispatch of
        hundreds of queued steps reliably wedges the XLA:CPU runtime on
        small hosts (each step's 8-virtual-device collectives compete for
        the same threadpool; observed: 300 queued steps deadlock on a
        2-core machine, 50 are fine). A periodic block costs ~one relay
        round trip per ``sync_every`` steps and bounds the in-flight queue
        on every backend. 0 disables.
        """
        scenario = self.shard_scenario(scenario)
        state = self.init_state(scenario)
        metrics = None
        for i in range(n_steps):
            state, metrics = self.step(state, scenario)
            if sync_every and i % sync_every == sync_every - 1:
                jax.block_until_ready(metrics)
        return state, metrics


def random_fleet_scenario(
    problem: MpcProblem,
    batch_size: int,
    seed: int = 0,
    goal_box=((-3.0, -3.0, 0.0), (3.0, 3.0, 1.0)),
    obstacle_box=((-2.0, -2.0, 0.0), (2.0, 2.0, 1.0)),
    obstacle_radius=(0.2, 0.6),
    r_body: float = 0.2,
    u_limit: float = 10.0,
    joint_limit: float = 10.0,
    reachable_goals: bool = False,
) -> FleetScenario:
    """Randomized (x0, goal, obstacles, limits) batch — the "batched fleet"
    benchmark configuration (BASELINE.json: 4096 randomized scenarios).

    ``reachable_goals``: sample each goal as the end-effector FK image of a
    random joint configuration (reachable by construction), rejection-matched
    into ``goal_box``. Required for fixed-base arms (panda): a plain box
    sample puts a large fraction of goals outside the ~0.85 m workspace, so
    ``mean_goal_distance`` saturates at the unreachable residual no matter
    how good the controller is. Free-base robots (pointRobot, boxer) have
    unbounded workspaces and don't need it.
    """
    rng = np.random.default_rng(seed)
    dims = problem.dims
    pm = problem.param_map
    params = np.zeros((batch_size, dims.N, problem.npar), dtype=np.float32)
    # Scenario generation is host-side one-shot work; pin its FK programs to
    # the CPU backend. On remote-relay TPU setups every extra TPU executable
    # costs a fixed multi-second load even on compile-cache hits, and these
    # tiny programs would otherwise sit on the benchmark's critical path.
    _cpu = local_cpu_device()

    # joint-limit-aware configuration sampling box (ADVICE r4): intersect the
    # generic +-1.8 rad box with the URDF joint limits so sampled
    # configurations (and their FK-image goals) are reachable under the REAL
    # limits, not only under the benchmark's widened limit parameters
    kin = problem.kin
    q_lo = np.full((dims.n,), -1.8)
    q_hi = np.full((dims.n,), 1.8)
    n_arm = kin.joint_limits.shape[0]
    if n_arm and dims.n >= n_arm:
        off = dims.n - n_arm
        q_lo[off:] = np.maximum(q_lo[off:], kin.joint_limits[:, 0])
        q_hi[off:] = np.minimum(q_hi[off:], kin.joint_limits[:, 1])

    def set_all(name, values):
        """values: (B, k) broadcast over stages."""
        if name not in pm.entries:
            return
        start, k = pm.entries[name]
        params[:, :, start : start + k] = values[:, None, :]

    weights = problem.mpc.weights
    if "wgoal" in pm.entries:
        set_all("wgoal", np.full((batch_size, pm.size("wgoal")), weights["w"]))
    set_all("wu", np.full((batch_size, pm.size("wu")), weights["wu"]))
    if "ws" in pm.entries and problem.mpc.slack:
        set_all("ws", np.full((batch_size, 1), weights["ws"]))
    if "wconstr" in pm.entries:
        w = np.asarray(weights.get("wconstr", [0.0]), dtype=np.float32)
        set_all("wconstr", np.tile(w, (batch_size, 1)))
    lo, hi = np.asarray(goal_box[0]), np.asarray(goal_box[1])
    goals = rng.uniform(lo, hi, size=(batch_size, 3)).astype(np.float32)
    if reachable_goals and "goal" in pm.entries:
        # goal := fk_ee(q_rand) — reachable by construction; rejection-match
        # into goal_box, keeping the (reachable) FK image for the stragglers
        fk_ee_b = jax.jit(
            jax.vmap(lambda q: problem.kin.fk_pos(q, problem.robot.end_link))
        )
        with jax.default_device(_cpu):
            q_rand = rng.uniform(q_lo, q_hi, size=(batch_size, dims.n)).astype(
                np.float32
            )
            ee = np.asarray(fk_ee_b(jnp.asarray(q_rand)))
            for _ in range(32):
                in_box = np.all((ee >= lo) & (ee <= hi), axis=1)
                if in_box.all():
                    break
                n_bad = int((~in_box).sum())
                q_rand[~in_box] = rng.uniform(q_lo, q_hi, size=(n_bad, dims.n))
                ee = np.asarray(fk_ee_b(jnp.asarray(q_rand)))
        goals = ee.astype(np.float32)
    set_all("goal", goals[:, : dims.m])
    if "r_body" in pm.entries:
        set_all("r_body", np.full((batch_size, 1), r_body))
    xinit = np.zeros((batch_size, dims.nx), dtype=np.float32)
    if dims.base_type == "holonomic":
        xinit[:, : dims.n] = rng.uniform(-1.0, 1.0, size=(batch_size, dims.n))
    else:
        xinit[:, :3] = rng.uniform(-1.0, 1.0, size=(batch_size, 3))

    # Initial states must satisfy the state-only constraints the problem
    # imposes AT t=0 (x0 is pinned — no solver can repair an initially
    # violated clearance): rejection-sample configurations until every
    # configured self-collision pair starts with >= 2*r_body + margin.
    sc_pairs = (
        problem.robot.self_collision_pairs
        if "SelfCollisionAvoidanceConstraints" in problem.mpc.constraints
        else []
    )
    if sc_pairs and dims.base_type == "holonomic":
        pair_links = sorted({l for pair in sc_pairs for l in pair})

        @jax.jit
        @jax.vmap
        def _pair_clearance(q):
            fk = {l: problem.kin.fk_pos(q, l) for l in pair_links}
            d = jnp.stack(
                [jnp.linalg.norm(fk[a] - fk[b]) for a, b in sc_pairs]
            )
            return jnp.min(d) - 2.0 * r_body

        with jax.default_device(_cpu):
            for attempt in range(32):
                clear = np.asarray(_pair_clearance(jnp.asarray(xinit[:, : dims.n])))
                bad = clear < 0.05
                if not bad.any():
                    break
                xinit[bad, : dims.n] = rng.uniform(
                    -1.0, 1.0, size=(int(bad.sum()), dims.n)
                )
            else:
                import warnings

                warnings.warn(
                    f"random_fleet_scenario: self-collision rejection sampling "
                    f"exhausted after 32 rounds; {int(bad.sum())}/{batch_size} "
                    f"scenarios start within 2*r_body of self-collision",
                    stacklevel=2,
                )

    if "obst" in pm.entries:
        # Rejection-sample obstacle positions so no scenario *starts* in
        # collision (an initially-violated hard constraint is an invalid
        # scenario, not a solvable one; cf. the reference's EmptyObstacle
        # padding for "no obstacle here", mpcPlanner.py:18-26).
        import jax.numpy as _jnp

        olo, ohi = np.asarray(obstacle_box[0]), np.asarray(obstacle_box[1])
        n_obst = dims.n_obst
        links = list(problem.robot.collision_links)
        with jax.default_device(_cpu):
            fk0 = np.asarray(
                jax.jit(jax.vmap(lambda q: problem.kin.fk_pos_links(q, links)))(
                    _jnp.asarray(xinit[:, : dims.n])
                )
            )  # (B, L, 3)
        pos = rng.uniform(olo, ohi, size=(batch_size, n_obst, 3)).astype(np.float32)
        rad = rng.uniform(*obstacle_radius, size=(batch_size, n_obst, 1)).astype(np.float32)
        for _ in range(32):
            clearance = (
                np.linalg.norm(fk0[:, :, None, :] - pos[:, None, :, :], axis=-1)
                - rad[:, None, :, 0]
                - r_body
            ).min(axis=(1, 2))
            # an obstacle containing the goal point makes the scenario
            # infeasible by construction (the tracker is asked to park the
            # end-effector inside a forbidden sphere) — reject those too
            goal_clear = (
                np.linalg.norm(goals[:, None, :] - pos, axis=-1)
                - rad[:, :, 0]
                - r_body
            ).min(axis=1)
            bad = (clearance < 0.1) | (goal_clear < 0.1)
            if not bad.any():
                break
            pos[bad] = rng.uniform(olo, ohi, size=(int(bad.sum()), n_obst, 3))
            rad[bad] = rng.uniform(*obstacle_radius, size=(int(bad.sum()), n_obst, 1))
        else:
            import warnings

            warnings.warn(
                f"random_fleet_scenario: obstacle rejection sampling exhausted "
                f"after 32 rounds; {int(bad.sum())}/{batch_size} scenarios keep "
                f"an obstacle within 0.1 of the start pose or goal",
                stacklevel=2,
            )
        set_all("obst", np.concatenate([pos, rad], axis=-1).reshape(batch_size, -1))
    for i in range(dims.n_obst):
        if f"lin_constrs_{i}" in pm.entries:
            plane = np.tile(
                np.array([1.0, 0.0, 0.0, -100.0], np.float32), (batch_size, 1)
            )
            set_all(f"lin_constrs_{i}", plane)
    set_all("lower_limits", np.full((batch_size, dims.n), -joint_limit, np.float32))
    set_all("upper_limits", np.full((batch_size, dims.n), joint_limit, np.float32))
    set_all("lower_limits_u", np.full((batch_size, dims.nu), -u_limit, np.float32))
    set_all("upper_limits_u", np.full((batch_size, dims.nu), u_limit, np.float32))
    set_all("lower_limits_vel", np.full((batch_size, 2), -u_limit, np.float32))
    set_all("upper_limits_vel", np.full((batch_size, 2), u_limit, np.float32))
    return FleetScenario(xinit=jnp.asarray(xinit), params=jnp.asarray(params))

"""Mixed-robot fleet: heterogeneous problem classes stepped as one group.

This is the expert-parallelism analog named in SURVEY §2 ("heterogeneous
robot models in one batch -> grouped batching per model type") and the
BASELINE fleet configuration ("4096 randomized scenarios (mixed
robots/goals/obstacles)"). Robot classes have different static shapes
(nx, nu, N, constraint sets), so they cannot share one compiled program;
the TPU-idiomatic layout is *grouped batching*: one compiled ``fleet_step``
per problem class, each vmapped over its own homogeneous sub-batch and
sharded over the same device mesh.

Per control step the group dispatches every class's jitted step
back-to-back; JAX's async dispatch queues them on the devices with no host
round-trip in between, so the device timeline is the concatenation of the
class programs (the XLA analog of an MoE grouped GEMM schedule). Metrics
come back per class plus a batch-size-weighted aggregate.

The reference has no counterpart: its planner binds ONE generated solver
for ONE robot per process (reference ``robotmpcs/planner/mpcPlanner.py:43-73``
loads a single solver directory and ``solve()`` serves a single scenario).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import (
    FleetMetrics,
    FleetRunner,
    FleetScenario,
    FleetState,
    random_fleet_scenario,
)
from robot_mpcs_tpu.parallel.mesh import make_mesh


class GroupMetrics(NamedTuple):
    """Aggregate + per-class metrics of one mixed-fleet step."""

    #: batch-size-weighted aggregate over all classes
    overall: FleetMetrics
    #: one FleetMetrics per problem class, keyed by class name
    per_class: Dict[str, FleetMetrics]


def _aggregate(per_class: Dict[str, FleetMetrics], sizes: Dict[str, int]) -> FleetMetrics:
    """Weighted mean for rates/means, max for max-style fields."""
    total = float(sum(sizes.values()))
    w = {k: sizes[k] / total for k in per_class}

    def wmean(field: str) -> jnp.ndarray:
        return sum(w[k] * getattr(m, field) for k, m in per_class.items())

    def gmax(field: str) -> jnp.ndarray:
        vals = [getattr(m, field) for m in per_class.values()]
        out = vals[0]
        for v in vals[1:]:
            out = jnp.maximum(out, v)
        return out

    return FleetMetrics(
        converged_fraction=wmean("converged_fraction"),
        mean_cost=wmean("mean_cost"),
        max_violation=gmax("max_violation"),
        max_violation_converged=gmax("max_violation_converged"),
        max_violation_unconverged=gmax("max_violation_unconverged"),
        mean_goal_distance=wmean("mean_goal_distance"),
        reset_fraction=wmean("reset_fraction"),
        mean_iterations=wmean("mean_iterations"),
        max_iterations=gmax("max_iterations"),
        rescue_overflow_fraction=wmean("rescue_overflow_fraction"),
        max_violation0_raw=gmax("max_violation0_raw"),
    )


class FleetGroup:
    """Steps several homogeneous FleetRunners as one mixed fleet.

    ``problems``: ``{class_name: (MpcProblem, batch_size)}``. Every class
    shares the same mesh; each batch size must divide by the mesh size.
    """

    def __init__(
        self,
        problems: Dict[str, Tuple[MpcProblem, int]],
        mesh=None,
        **runner_kwargs,
    ):
        if not problems:
            raise ValueError("FleetGroup needs at least one problem class")
        self.mesh = mesh if mesh is not None else make_mesh()
        self.runners: Dict[str, FleetRunner] = {}
        self.sizes: Dict[str, int] = {}
        for name, (problem, batch) in problems.items():
            self.runners[name] = FleetRunner(
                problem, batch_size=batch, mesh=self.mesh, **runner_kwargs
            )
            self.sizes[name] = batch
        self.total_batch = sum(self.sizes.values())

    # ------------------------------------------------------------------ API

    def shard_scenarios(
        self, scenarios: Dict[str, FleetScenario]
    ) -> Dict[str, FleetScenario]:
        return {k: self.runners[k].shard_scenario(s) for k, s in scenarios.items()}

    def init_states(
        self, scenarios: Dict[str, FleetScenario]
    ) -> Dict[str, FleetState]:
        return {k: self.runners[k].init_state(scenarios[k]) for k in self.runners}

    def step(
        self,
        states: Dict[str, FleetState],
        scenarios: Dict[str, FleetScenario],
    ) -> Tuple[Dict[str, FleetState], GroupMetrics]:
        """Advance every class by one control step.

        All class programs are dispatched before any result is read, so the
        per-class jitted steps run back-to-back on the device queue without
        host synchronization between classes.
        """
        new_states: Dict[str, FleetState] = {}
        per_class: Dict[str, FleetMetrics] = {}
        for name, runner in self.runners.items():
            new_states[name], per_class[name] = runner.step(
                states[name], scenarios[name]
            )
        return new_states, GroupMetrics(
            overall=_aggregate(per_class, self.sizes), per_class=per_class
        )

    def run(
        self, scenarios: Dict[str, FleetScenario], n_steps: int
    ) -> Tuple[Dict[str, FleetState], GroupMetrics]:
        scenarios = self.shard_scenarios(scenarios)
        states = self.init_states(scenarios)
        metrics: Optional[GroupMetrics] = None
        for _ in range(n_steps):
            states, metrics = self.step(states, scenarios)
        return states, metrics


def mixed_fleet_scenarios(
    problems: Dict[str, Tuple[MpcProblem, int]],
    seed: int = 0,
    sampler_kwargs: Optional[Dict[str, dict]] = None,
) -> Dict[str, FleetScenario]:
    """Randomized scenarios for every class of a mixed fleet (the BASELINE
    "mixed robots/goals/obstacles" configuration). ``sampler_kwargs`` maps a
    class name to extra ``random_fleet_scenario`` arguments (goal boxes etc.
    differ per robot family)."""
    sampler_kwargs = sampler_kwargs or {}
    out = {}
    for i, (name, (problem, batch)) in enumerate(problems.items()):
        out[name] = random_fleet_scenario(
            problem, batch, seed=seed + 1000 * i, **sampler_kwargs.get(name, {})
        )
    return out

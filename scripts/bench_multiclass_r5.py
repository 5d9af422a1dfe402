"""One-off: pointRobot + boxer fleet throughput with round-5 production
tiers on the real TPU (bench.py's multiclass extras are wall-clock-budgeted
and usually skipped on the relay machine; this records the rows for
SCALING.md)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from robot_mpcs_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from robot_mpcs_tpu.config import load_setup
from robot_mpcs_tpu.models.problem import MpcProblem
from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
from robot_mpcs_tpu.parallel.mesh import make_mesh

SPECS = {
    "pointRobot": dict(
        config="pointRobotMpc.yaml",
        weights={"wconstr": [0.005, 0.0, 0.0, 0.0]},
        sampler=dict(goal_box=((-2.0, -2.0, 0.05), (2.0, 2.0, 0.05)),
                     obstacle_box=((-1.5, -1.5, 0.05), (1.5, 1.5, 0.05))),
    ),
    "boxer": dict(
        config="boxerMpc.yaml",
        weights={},
        sampler=dict(goal_box=((-2.0, -2.0, 0.0), (2.0, 2.0, 0.0)),
                     obstacle_box=((5.0, 5.0, 0.0), (6.0, 6.0, 0.0))),
    ),
}


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mesh = make_mesh(devices=jax.devices())
    B, steps = 1024, 20
    for name, spec in SPECS.items():
        setup = load_setup(os.path.join(here, "examples", "config", spec["config"]))
        setup.mpc.weights.update(spec["weights"])
        problem = MpcProblem(setup)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            runner = FleetRunner(problem, batch_size=B, mesh=mesh)
            scen = runner.shard_scenario(
                random_fleet_scenario(problem, B, seed=0, **spec["sampler"])
            )
        state = runner.init_state(scen)
        for _ in range(8):
            t1 = time.perf_counter()
            state, m = runner.step(state, scen)
            float(m.converged_fraction)
            if time.perf_counter() - t1 < 1.5:
                break
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = runner.step(state, scen)
        jax.block_until_ready(m)
        float(m.converged_fraction)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "class": name,
            "solves_per_s_per_chip": round(B * steps / dt / len(jax.devices()), 1),
            "converged": round(float(m.converged_fraction), 4),
            "step_ms": round(1000 * dt / steps, 2),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Worker for the 2-process distributed smoke test (see test_distributed.py).

Each OS process owns 2 virtual CPU devices; jax.distributed stitches them
into a 4-device global mesh (gloo collectives). Both ranks build the SAME
scenario from a shared seed, run one fleet step of the point-robot problem
sharded over the global batch axis, and print the (replicated) metrics —
the parent asserts both ranks printed identical values.

Run directly by the test harness, not by pytest.
"""

import os
import sys

# must precede jax import: 2 virtual CPU devices per process
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
        # raised collective watchdog timeouts: see tests/conftest.py
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120 --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robot_mpcs_tpu.parallel import distributed


def main() -> None:
    assert distributed.initialize(), "rendezvous env vars missing"
    rank = jax.process_index()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()  # global view
    assert len(jax.local_devices()) == 2

    from robot_mpcs_tpu.config import load_setup
    from robot_mpcs_tpu.models.problem import MpcProblem
    from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
    from robot_mpcs_tpu.parallel.mesh import make_mesh

    here = os.path.dirname(os.path.abspath(__file__))
    setup = load_setup(os.path.join(here, "..", "examples", "config", "pointRobotMpc.yaml"))
    setup.mpc.weights["wconstr"] = [0.005, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)

    mesh = make_mesh()  # spans both processes
    B = 8  # 2 scenarios per device
    runner = FleetRunner(problem, batch_size=B, mesh=mesh)
    # identical host-side scenario on every rank (shared seed) -> shard_batch
    # materializes only each rank's addressable shards
    scenario = runner.shard_scenario(
        random_fleet_scenario(
            problem, B, seed=21,
            goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
            obstacle_box=((5, 5, 0.05), (6, 6, 0.05)),
        )
    )
    state = runner.init_state(scenario)
    for _ in range(2):
        state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)

    # metric scalars are fully replicated -> identical on every rank
    print(
        f"METRICS rank={rank} "
        f"converged={float(metrics.converged_fraction):.6f} "
        f"cost={float(metrics.mean_cost):.6f} "
        f"viol={float(metrics.max_violation):.8f} "
        f"reset={float(metrics.reset_fraction):.6f}"
    )
    assert float(metrics.reset_fraction) == 0.0
    assert float(metrics.converged_fraction) > 0.9
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

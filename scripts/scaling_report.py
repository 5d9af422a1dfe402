"""Scaling-efficiency report: fleet solves/s vs device count (weak scaling).

BASELINE.md requires scaling efficiency at 1 chip / 1 host / >= 2 hosts.
Real multi-chip hardware is not available in this environment, so this
script measures what CAN be measured honestly and records the result in
SCALING.md:

* weak scaling over a VIRTUAL CPU mesh (1/2/4/8 devices, fixed per-device
  sub-batch) — exercises the identical sharding/collective program a TPU
  slice runs, with XLA CPU threading standing in for chips;
* the same fleet step over 2 OS PROCESSES (jax.distributed + gloo), the
  multi-host rendezvous/DCN analog;
* the 1-chip TPU number comes from bench.py (BENCH_r*.json).

Usage: python scripts/scaling_report.py            # full sweep -> stdout
       python scripts/scaling_report.py --worker N # internal (one mesh size)
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

PER_DEVICE_BATCH = int(os.environ.get("SCALING_PER_DEVICE_BATCH", "64"))
STEPS = int(os.environ.get("SCALING_STEPS", "5"))
ROBOT = os.environ.get("SCALING_ROBOT", "pointRobotMpc.yaml")


def worker(n_dev: int) -> None:
    sys.path.insert(0, REPO)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120 --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import time

    from robot_mpcs_tpu.config import load_setup
    from robot_mpcs_tpu.models.problem import MpcProblem
    from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
    from robot_mpcs_tpu.parallel.mesh import make_mesh

    setup = load_setup(os.path.join(REPO, "examples", "config", ROBOT))
    setup.mpc.weights["wconstr"] = [0.005, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)
    B = PER_DEVICE_BATCH * n_dev
    mesh = make_mesh(devices=jax.devices()[:n_dev])
    runner = FleetRunner(problem, batch_size=B, mesh=mesh)
    scenario = runner.shard_scenario(
        random_fleet_scenario(
            problem, B, seed=0,
            goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
            obstacle_box=((-1, -1, 0.05), (1, 1, 0.05)),
        )
    )
    state = runner.init_state(scenario)
    state, metrics = runner.step(state, scenario)  # compile + warm
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "n_devices": n_dev,
        "batch": B,
        "solves_per_s": B * STEPS / dt,
        "step_ms": 1000.0 * dt / STEPS,
        "converged_fraction": float(metrics.converged_fraction),
    }))


def mp_worker(n_dev_local: int) -> None:
    """One rank of the 2-process run: n_dev_local virtual devices, gloo
    collectives, global mesh spanning both ranks. Prints throughput from
    rank 0 (both ranks execute the same SPMD program in lockstep)."""
    sys.path.insert(0, REPO)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev_local}"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120 --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from robot_mpcs_tpu.parallel import distributed

    assert distributed.initialize(), "rendezvous env vars missing"

    import time

    from robot_mpcs_tpu.config import load_setup
    from robot_mpcs_tpu.models.problem import MpcProblem
    from robot_mpcs_tpu.parallel.fleet import FleetRunner, random_fleet_scenario
    from robot_mpcs_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())  # global
    setup = load_setup(os.path.join(REPO, "examples", "config", ROBOT))
    setup.mpc.weights["wconstr"] = [0.005, 0.0, 0.0, 0.0]
    problem = MpcProblem(setup)
    B = PER_DEVICE_BATCH * n_dev
    mesh = make_mesh()  # spans both processes
    runner = FleetRunner(problem, batch_size=B, mesh=mesh)
    scenario = runner.shard_scenario(
        random_fleet_scenario(
            problem, B, seed=0,
            goal_box=((-2, -2, 0.05), (2, 2, 0.05)),
            obstacle_box=((-1, -1, 0.05), (1, 1, 0.05)),
        )
    )
    state = runner.init_state(scenario)
    state, metrics = runner.step(state, scenario)  # compile + warm
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = runner.step(state, scenario)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    if jax.process_index() == 0:
        print(json.dumps({
            "n_processes": jax.process_count(),
            "n_devices": n_dev,
            "batch": B,
            "solves_per_s": B * STEPS / dt,
            "step_ms": 1000.0 * dt / STEPS,
            "converged_fraction": float(metrics.converged_fraction),
        }))
    jax.distributed.shutdown()


def run_two_process(n_dev_local: int):
    """Spawn the 2-rank run (the >= 2-host analog: same rendezvous /
    global-mesh / collective machinery as a 2-host TPU pod, transport is
    local TCP instead of DCN)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env_base = {k: v for k, v in os.environ.items() if not k.startswith(("XLA_", "JAX_"))}
    procs = []
    for rank in range(2):
        env = dict(
            env_base,
            ROBOT_MPCS_COORDINATOR=f"127.0.0.1:{port}",
            ROBOT_MPCS_NUM_PROCESSES="2",
            ROBOT_MPCS_PROCESS_ID=str(rank),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--mp-worker", str(n_dev_local)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"2-process rank {rank} FAILED:\n{out}", file=sys.stderr)
            return None
    lines = [l for out in outs for l in out.splitlines() if l.startswith("{")]
    return json.loads(lines[-1]) if lines else None


def sweep() -> None:
    rows = []
    for n in (1, 2, 4, 8):
        env = {k: v for k, v in os.environ.items() if not k.startswith(("XLA_", "JAX_"))}
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            capture_output=True, text=True, env=env, timeout=900,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={n} FAILED:\n{out.stdout}\n{out.stderr}", file=sys.stderr)
            continue
        rows.append(json.loads(line[-1]))
        print(line[-1])
    if rows:
        base = rows[0]["solves_per_s"]
        print("\nweak-scaling efficiency vs 1 device:")
        for r in rows:
            eff = r["solves_per_s"] / (base * r["n_devices"])
            print(f"  {r['n_devices']} devices: {r['solves_per_s']:8.1f} solves/s"
                  f"  efficiency {100*eff:5.1f}%")

    # 2-process x 4-device global mesh vs the single-process 8-device row:
    # isolates the cross-process (DCN-analog) overhead at equal device count
    mp = run_two_process(4)
    if mp is not None:
        print("\n2-process (multi-host analog), 4 devices/process:")
        print(json.dumps(mp))
        ref = next((r for r in rows if r["n_devices"] == 8), None)
        if ref:
            print(f"  vs single-process 8-device: "
                  f"{100 * mp['solves_per_s'] / ref['solves_per_s']:.1f}%")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    elif len(sys.argv) > 2 and sys.argv[1] == "--mp-worker":
        mp_worker(int(sys.argv[2]))
    else:
        sweep()

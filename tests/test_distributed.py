"""Multi-process (multi-host analog) smoke test: 2 OS processes, one fleet.

BASELINE.md requires the scaling story to be real at >= 2 hosts; on this
single machine the closest faithful exercise is two separate OS processes
coordinated by ``jax.distributed`` with gloo CPU collectives — the same
rendezvous + global-mesh + per-process-addressable-shard machinery a real
2-host TPU deployment uses (only the transport differs: TCP here, DCN
there). The reference framework is single-process only (SURVEY §5).
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_fleet_step():
    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        # scrub inherited JAX/XLA settings; the worker sets its own
        if not k.startswith(("XLA_", "JAX_"))
    }
    procs = []
    for rank in range(2):
        env = dict(
            env_base,
            ROBOT_MPCS_COORDINATOR=f"127.0.0.1:{port}",
            ROBOT_MPCS_NUM_PROCESSES="2",
            ROBOT_MPCS_PROCESS_ID=str(rank),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    # both ranks computed the fleet step and report IDENTICAL replicated
    # metrics (the cross-process reduction went through gloo collectives)
    lines = []
    for out in outs:
        metric_lines = [l for l in out.splitlines() if l.startswith("METRICS")]
        assert len(metric_lines) == 1, out
        lines.append(metric_lines[0].split(" ", 2)[2])  # strip rank field
    assert lines[0] == lines[1], f"rank metrics differ:\n{lines[0]}\n{lines[1]}"

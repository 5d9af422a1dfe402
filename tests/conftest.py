"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py; tests must be hermetic and fast,
so we force the CPU backend with 8 virtual devices to exercise the same
sharding code paths as a multi-chip TPU slice.

Note: the ambient environment pins JAX_PLATFORMS=axon (TPU) and the platform
plugin overrides the env var during import, so the override must go through
jax.config.update after import (setting os.environ alone is ignored).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in _flags:
    # The sharded solver runs its batched while_loop conditions as
    # cross-device all-reduces. XLA CPU's collective watchdog CHECK-fails
    # (SIGABRT, no Python traceback) when one virtual device's threadpool
    # is starved past the default terminate timeout — which reliably
    # happens when anything CPU-heavy (e.g. a TPU Mosaic compile) runs on
    # the same machine. Raise both watchdog timeouts so contention slows
    # tests down instead of killing them.
    _flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    )
os.environ["XLA_FLAGS"] = _flags

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

_CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "config",
)


def config_path(name: str) -> str:
    """Absolute path of an example config yaml."""
    return os.path.join(_CONFIG_DIR, name)

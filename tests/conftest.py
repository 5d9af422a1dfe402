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
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

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

"""Device-selection helpers.

``jax.devices("cpu")[0]`` returns the first device of the GLOBAL topology:
in a multi-process (multi-host) run that is rank 0's device, which is
non-addressable from every other rank — eager computations placed there
cannot be fetched back (``RuntimeError: Fetching value for jax.Array that
spans non-addressable devices``). Always pin host-side build work to a
process-LOCAL device.
"""

from __future__ import annotations

import jax


def local_cpu_device():
    """The calling process's own CPU device (addressable by construction)."""
    return jax.local_devices(backend="cpu")[0]

"""Persistent XLA compilation cache setup.

The batched solver compiles to a large XLA program (tens of seconds on a cold
TPU). Enabling JAX's persistent compilation cache makes every process after
the first load the compiled executable from disk — this is the runtime analog
of the reference's persisted ForcesPro solver directory (the codegen artifact
that decouples offline build from online use, reference
``robotmpcs/models/mpcModel.py:128-141``).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "ROBOT_MPCS_TPU_CACHE", os.path.expanduser("~/.cache/robot_mpcs_tpu/xla")
)


def enable_compile_cache(cache_dir: str = _DEFAULT_DIR) -> str:
    """Enable the persistent compilation cache (idempotent).

    Best-effort: on a read-only HOME or sandboxed runtime the cache dir may
    not be creatable — constructing a planner must then degrade to running
    without a persistent cache, not raise (ADVICE r4).
    """
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, PermissionError) as e:
        import warnings

        warnings.warn(
            f"persistent compile cache disabled ({e}); every process will "
            f"recompile from scratch",
            stacklevel=2,
        )
        return ""
    return cache_dir

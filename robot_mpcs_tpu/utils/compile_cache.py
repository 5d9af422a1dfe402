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


def _machine_tag() -> str:
    """Fingerprint of the host CPU (model + feature flags).

    XLA's persistent-cache key does NOT include host CPU features; a CPU
    AOT entry compiled on a machine with e.g. AMX/prefer-no-scatter
    support loads on a lesser host with only a logged warning and then
    dies with SIGILL/SIGSEGV at execution (observed when a cache written
    on one CI machine was reused on another). Namespacing the default
    cache directory per machine makes stale-by-machine entries invisible
    instead of fatal.
    """
    import hashlib
    import platform

    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    ident += "|" + line.split(":", 1)[1].strip()
                    if ident.count("|") >= 2:
                        break
    except OSError:
        ident += "|" + (platform.processor() or "unknown")
    return hashlib.sha1(ident.encode()).hexdigest()[:10]


_DEFAULT_DIR = os.environ.get(
    "ROBOT_MPCS_TPU_CACHE",
    os.path.expanduser(f"~/.cache/robot_mpcs_tpu/xla-{_machine_tag()}"),
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

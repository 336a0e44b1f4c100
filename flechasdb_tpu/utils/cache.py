"""Persistent XLA compilation cache (EXTENSION — no reference analogue).

The reference has no compilation step; on TPU the first build/query of each
process pays XLA trace+compile (tens of seconds through a remote-compile
tunnel, worse on small hosts). Enabling the on-disk cache makes every later
process reuse the compiled executables — the cold-start story behind the
BASELINE <10 s build target (see benchmarks/RESULTS.md "Cold-start note").
"""

from __future__ import annotations

import os

#: Default cache location: repo-local so CI images / serverless snapshots
#: carry the warmed cache with the code.
DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turns on JAX's persistent compilation cache.

    Apply before any compilation. Safe on any backend; harmless if the
    plugin does not support it (JAX falls back to compiling).
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax knob names
        pass

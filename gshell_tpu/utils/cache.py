"""Persistent XLA compilation cache — amortizes multi-minute compiles of the
fused train step across processes/runs (bench ladder, driver re-runs)."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/gshell_jax_cache"):
    import jax

    # Opt-out: cached executables can be AOT-compiled on a DIFFERENT machine
    # (remote-compile environments) — a host-feature mismatch loads with an
    # "could lead to execution errors" warning and must be bypassable.
    if os.environ.get("GSHELL_NO_COMPILE_CACHE"):
        return
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is best-effort

"""Persistent XLA compilation cache.

First-play compiles cost 5–120 s on the TPU (large voice graphs through
a remote tunnel compile slowly and nondeterministically).  JAX's
persistent compilation cache makes every repeat session near-instant:
measured 11.2 s -> 1.1 s for the same executable in a fresh process.
Entry points (CLI, REPL, bench) opt in; set TUUN_JAX_CACHE to relocate
the directory or to "0"/"off" to disable.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional


def enable(path: Optional[str] = None) -> Optional[str]:
    """Points JAX at an on-disk compilation cache.  Safe to call any
    time before the first compile; returns the directory used, or None
    when disabled/unsupported."""
    env = os.environ.get("TUUN_JAX_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable"):
        return None
    target = path or env or str(Path.home() / ".cache" / "tuun_tpu" / "xla")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", target)
        # Everything nontrivial: even 1-second compiles repeat across
        # sessions (the REPL recompiles per voice structure).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return target

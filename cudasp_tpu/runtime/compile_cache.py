"""Persistent XLA compilation cache, on by default for scans.

The fused kernel compiles in ~60 s on a v5e; without a persistent cache
every process pays that on its first batch (the reference's CUDA kernels
are AOT-compiled into the extension binary, so its first batch is cheap —
this is the TPU-native equivalent). ensure() is idempotent and respects an
explicit user configuration; set CUDASP_COMPILE_CACHE=off to disable.
"""

from __future__ import annotations

import os

_done = False


def ensure() -> None:
    global _done
    if _done:
        return
    _done = True
    env = os.environ.get("CUDASP_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:       # user already chose one
        return
    path = env or os.path.join(
        os.path.expanduser("~"), ".cache", "cudasp_tpu", "jax-cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:                              # pragma: no cover
        pass                                       # cache is best-effort

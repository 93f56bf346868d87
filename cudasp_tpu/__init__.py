"""cudasp_tpu — a TPU-native vectorized query-execution engine for BIP-352
silent-payments scanning.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the
duckdb-cudasp-extension reference (CUDA/C++): batched secp256k1 EC crypto as a
table-valued filter over tens of millions of rows, sharded over TPU meshes.

Public API:
    scan(table, scan_private_key, spend_public_key, label_keys, batch_size=...)
        -> matching rows (txid, height, tweak_key), mirroring the reference's
        cudasp_scan SQL table function (/root/reference/README.md:70-119).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: the fused Pallas scan kernel takes minutes
# to compile cold; cached executables load in seconds. Users can override
# or disable via CUDASP_COMPILE_CACHE (empty string disables).
_cache_dir = _os.environ.get("CUDASP_COMPILE_CACHE", "/tmp/cudasp_jax_cache")
if _cache_dir and _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from .api import scan, scan_stream, ScanConfig, ScanResult  # noqa: F401,E402

__all__ = ["scan", "scan_stream", "ScanConfig", "ScanResult", "__version__"]

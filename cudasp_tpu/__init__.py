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

from .api import scan, ScanConfig, ScanResult  # noqa: F401,E402

__all__ = ["scan", "ScanConfig", "ScanResult", "__version__"]

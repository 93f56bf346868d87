"""Typed errors for the scan engine.

The reference signals failure by printf + returning -1/nullptr and then
silently produces zero matches for the failed batch
(/root/reference/src/cudasp_gpu.cu:467-469, src/cudasp_extension.cu:325,378).
Here every failure is loud and typed."""


class CudaspError(Exception):
    """Base class for scan-engine errors."""


class BindError(CudaspError):
    """Invalid query arguments (sizes, types) — mirrors the reference's
    binder-level validation (src/cudasp_extension.cu:420-509)."""


class IngestError(CudaspError):
    """Malformed input table."""


class ExecutionError(CudaspError):
    """A batch failed on device; carries the batch index."""

    def __init__(self, batch_index: int, cause: Exception):
        super().__init__(f"batch {batch_index} failed: {cause!r}")
        self.batch_index = batch_index
        self.cause = cause

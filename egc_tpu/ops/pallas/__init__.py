from egc_tpu.ops.pallas.gather_reduce import (  # noqa: F401
    segment_gather_reduce, csr_rowptr_np, block_ptr_np,
)

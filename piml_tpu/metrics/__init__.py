from piml_tpu.metrics.metrics import (  # noqa: F401
    collision_count,
    mae_with_time_mask,
    mmd_masked,
    mmd_masked_chunked,
    mmd_with_time_mask,
    ot_with_time_mask,
    sinkhorn_masked,
    sinkhorn_masked_chunked,
)

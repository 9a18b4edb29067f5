from egc_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_count,
    segment_mean,
    segment_max,
    segment_min,
    segment_var,
    segment_std,
    segment_softmax,
    multi_aggregate,
    AGGREGATORS,
    canonical_aggr,
)

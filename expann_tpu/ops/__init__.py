from expann_tpu.ops.distance import (
    pairwise_dist2,
    batched_neighbour_dist2,
    squared_norms,
    pad_dim,
    pad_rows,
    LANE,
)

__all__ = [
    "pairwise_dist2",
    "batched_neighbour_dist2",
    "squared_norms",
    "pad_dim",
    "pad_rows",
    "LANE",
]

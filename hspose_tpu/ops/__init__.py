from hspose_tpu.ops.knn import (
    gather_neighbors,
    knn_indices,
    nearest_index,
    neighbor_directions_normalized,
    pairwise_sq_dist,
)
from hspose_tpu.ops.sampling import (
    batched_sample_points,
    pool_subsample_indices,
    sample_points_fixed,
)

__all__ = [
    "gather_neighbors",
    "knn_indices",
    "nearest_index",
    "neighbor_directions_normalized",
    "pairwise_sq_dist",
    "batched_sample_points",
    "pool_subsample_indices",
    "sample_points_fixed",
]

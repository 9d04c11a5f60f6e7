from hspose_tpu.ops.chamfer import (
    chamfer_distance,
    chamfer_distance_pallas,
    chamfer_loss,
)
from hspose_tpu.ops.knn import (
    gather_neighbors,
    knn_indices,
    knn_indices_fast,
    nearest_index,
    neighbor_directions_normalized,
    pairwise_sq_dist,
)
from hspose_tpu.ops.pallas_hs import hs_support_reduce, hs_surface_reduce
from hspose_tpu.ops.pallas_hs_fused import hs_support_fused, hs_surface_fused
from hspose_tpu.ops.pallas_knn import knn_indices_pallas
from hspose_tpu.ops.sampling import (
    batched_sample_points,
    pool_subsample_indices,
    sample_points_fixed,
)

__all__ = [
    "chamfer_distance", "chamfer_distance_pallas", "chamfer_loss",
    "gather_neighbors", "knn_indices", "knn_indices_fast", "nearest_index",
    "neighbor_directions_normalized", "pairwise_sq_dist",
    "hs_support_reduce", "hs_surface_reduce", "hs_support_fused",
    "hs_surface_fused", "knn_indices_pallas",
    "batched_sample_points", "pool_subsample_indices", "sample_points_fixed",
]

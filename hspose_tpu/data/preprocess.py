"""Fused on-device preprocessing: depth ROI → fixed-size point cloud.

The reference back-projects and samples per-sample on the host in DataLoader workers
(``datasets/load_data._depth_to_pcl`` :322-333, ``_sample_points`` :307-320, and the
net-side ``network/point_sample/pc_sample.PC_sample``).  Here the whole stage is one
jitted, batched function (the BASELINE.json north-star 'fused preprocessing'): the
host ships the 256×256 depth/mask/coord crops; masking, pinhole back-projection,
validity filtering (≥50-point rule) and keyed fixed-size sampling all run on device
with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hspose_tpu.ops.sampling import sample_points_fixed


def backproject_roi(depth: jnp.ndarray, mask: jnp.ndarray, coord2d: jnp.ndarray,
                    cam_k: jnp.ndarray):
    """Pinhole back-projection of one ROI (static shapes).

    depth: (H, W) in mm; mask: (H, W) {0,1}; coord2d: (2, H, W) original-image pixel
    coordinates; cam_k: (3, 3).

    Returns (points (H·W, 3) in mm, valid (H·W,) bool).  Matches
    ``_depth_to_pcl`` (load_data.py:322-333): valid = depth > 0 ∧ mask > 0;
    x = (u−cx)·z/fx, y = (v−cy)·z/fy.
    """
    fx, fy = cam_k[0, 0], cam_k[1, 1]
    cx, cy = cam_k[0, 2], cam_k[1, 2]
    z = depth.reshape(-1).astype(jnp.float32)
    valid = jnp.logical_and(z > 0, mask.reshape(-1) > 0)
    u = coord2d[0].reshape(-1)
    v = coord2d[1].reshape(-1)
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1), valid


@functools.partial(jax.jit, static_argnames=("n_pts",))
def roi_to_pointcloud(key: jax.Array, depth: jnp.ndarray, mask: jnp.ndarray,
                      coord2d: jnp.ndarray, cam_k: jnp.ndarray, n_pts: int):
    """Batched fused preprocessing.

    depth (B, H, W) mm, mask (B, H, W), coord2d (B, 2, H, W), cam_k (B, 3, 3).
    Returns (pcl (B, n_pts, 3) in metres, n_valid (B,) int32).

    The caller can apply the reference's ≥50-valid-points rule
    (load_data.py:276-277) using n_valid.
    """
    def single(k, d, m, c, K):
        pts, valid = backproject_roi(d, m, c, K)
        pcl = sample_points_fixed(k, pts, valid, n_pts) / 1000.0
        return pcl, jnp.sum(valid.astype(jnp.int32))

    keys = jax.random.split(key, depth.shape[0])
    return jax.vmap(single)(keys, depth, mask, coord2d, cam_k)

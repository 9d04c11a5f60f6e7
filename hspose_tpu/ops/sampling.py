"""PRNG-keyed sampling ops (pool subsampling, fixed-size point selection).

The reference relies on global torch/numpy RNG (``torch.randperm`` in
``gcn3d.Pool_layer`` :243, ``np.random.permutation``/``choice`` in
``datasets/load_data._sample_points`` :307-320 and ``network/point_sample/pc_sample``).
Here every draw takes an explicit ``jax.random`` key so runs are reproducible by
construction and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pool_subsample_indices(key: jax.Array, n: int, pool_n: int) -> jnp.ndarray:
    """Random subset of ``pool_n`` of ``n`` indices, shared across the batch.

    Matches ``gcn3d.Pool_layer`` (:242-245): one ``randperm(n)[:n/rate]`` applied to
    every batch element (the reference deliberately shares the permutation).
    """
    return jax.random.permutation(key, n)[:pool_n]


def sample_points_fixed(key: jax.Array, points: jnp.ndarray, valid: jnp.ndarray,
                        n_out: int) -> jnp.ndarray:
    """Sample exactly ``n_out`` points from a padded, masked cloud (jit-safe).

    points: (N, 3) padded cloud; valid: (N,) bool mask; returns (n_out, 3).

    TPU-native equivalent of the host-side ``_sample_points`` (load_data.py:307-320):
    when more than ``n_out`` points are valid we take a random subset; when fewer, the
    valid points are tiled (sampling with wrap-around).  Implemented with a single
    keyed permutation + top-k over masked random scores so shapes stay static.
    """
    n = points.shape[0]
    # random priority; invalid points pushed to the bottom
    scores = jax.random.uniform(key, (n,)) + jnp.where(valid, 1.0, 0.0)
    _, order = jax.lax.top_k(scores, n)  # valid points first, random order
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # positions 0..n_out-1 take order[i mod n_valid] so short clouds tile
    pos = jnp.arange(n_out, dtype=jnp.int32)
    idx = order[jnp.where(n_valid > 0, pos % jnp.maximum(n_valid, 1), pos)]
    return points[idx]


def batched_sample_points(key: jax.Array, points: jnp.ndarray, valid: jnp.ndarray,
                          n_out: int) -> jnp.ndarray:
    """vmapped ``sample_points_fixed``: (B, N, 3), (B, N) -> (B, n_out, 3)."""
    keys = jax.random.split(key, points.shape[0])
    return jax.vmap(sample_points_fixed, in_axes=(0, 0, 0, None))(keys, points, valid, n_out)

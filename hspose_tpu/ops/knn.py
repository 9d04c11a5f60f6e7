"""K-nearest-neighbour search over point clouds / feature maps.

This is the hot primitive of the hybrid-scope backbone: the reference computes an
O(N²) pairwise-distance matrix + top-k **12 times per forward**
(``network/fs_net_repo/gcn3d.py:15-24``; call census in SURVEY.md §3.1).  On TPU the
B×N×N distance matrix is one big MXU matmul, and ``lax.top_k`` runs on-chip — so the
XLA path is already strong.  A Pallas flash-style tiled variant (running top-k over
key blocks, never materializing N² in HBM) lives in ``hspose_tpu.ops.pallas_knn`` for
large N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distance matrix: a (..., N, D), b (..., M, D) -> (..., N, M).

    Uses the ‖a‖² + ‖b‖² − 2a·b expansion so the inner product hits the MXU; the
    matmul accumulates in f32 regardless of input dtype (critical for KNN accuracy,
    SURVEY.md §7 'beware bf16 matmuls in the KNN distance').
    """
    inner = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((a.ndim - 1,), (b.ndim - 1,)),
                           (tuple(range(a.ndim - 2)), tuple(range(b.ndim - 2)))),
        preferred_element_type=jnp.float32,
        # full-f32 MXU passes: at default precision the distance error reaches the
        # bf16 quantum (~1e-2), which reorders neighbours at the k boundary
        precision=jax.lax.Precision.HIGHEST,
    )
    a_sq = jnp.sum(a.astype(jnp.float32) ** 2, axis=-1)
    b_sq = jnp.sum(b.astype(jnp.float32) ** 2, axis=-1)
    return a_sq[..., :, None] + b_sq[..., None, :] - 2.0 * inner


@functools.partial(jax.jit, static_argnames=("k",))
def knn_indices(points: jnp.ndarray, k: int,
                source: jnp.ndarray | None = None) -> jnp.ndarray:
    """Indices of the k nearest neighbours, excluding the query point itself.

    points: (B, N, D).  Returns int32 (B, N, k).

    Matches ``gcn3d.get_neighbor_index`` (:15-24): top-(k+1) smallest distances, drop
    the first column (self).  Ties therefore resolve in the same ordered-by-distance
    way (top_k is stable on equal keys by index).

    ``source`` (B, M, D) searches a different candidate set (the sequence-parallel
    serving path passes local queries against the all-gathered global cloud);
    indices are into ``source``, which must CONTAIN every query row (the self-drop
    contract) — under SP the queries are a shard of the gathered source, so this
    holds by construction.
    """
    d = pairwise_sq_dist(points, points if source is None else source)
    _, idx = jax.lax.top_k(-d, k + 1)
    return idx[..., 1:]


def knn_indices_fast(points: jnp.ndarray, k: int, fast: bool = False,
                     source: jnp.ndarray | None = None) -> jnp.ndarray:
    """Backend-dispatching KNN: the fused Pallas kernel on TPU (8× faster than the
    sort-based top_k there), the XLA path elsewhere.  Trace-time decision.

    ``fast=True`` (TPU only) trades ~2⁻¹² distance precision for a ~2× cheaper
    selection loop + one-pass bf16 distances — see ``pallas_knn.knn_indices_pallas``.
    """
    if jax.devices()[0].platform == "tpu":
        from hspose_tpu.ops.pallas_knn import (
            knn_indices_pallas,
            knn_indices_pallas_qs,
        )

        if source is not None:
            return knn_indices_pallas_qs(points, source, k, fast=fast)
        return knn_indices_pallas(points, k, fast=fast)
    return knn_indices(points, k, source=source)


@jax.jit
def nearest_index(target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """1-NN of each target point among source points: (B, N1, D), (B, N2, D) -> (B, N1).

    Matches ``gcn3d.get_nearest_index`` (:27-36) (used to upsample pooled feature maps
    back to the full cloud, FaceRecon.py:100-104).
    """
    d = pairwise_sq_dist(target, source)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def _gather_precision(dtype) -> jax.lax.Precision:
    """bf16 features gather exactly at DEFAULT (one-hot entries are exact 0/1 and
    bf16·bf16 accumulates in f32 on the MXU); f32 features need HIGHEST for the
    0-ULP guarantee (measured against take_along_axis)."""
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _split3(x):
    """f32 -> three bf16 arrays summing back to ~x (≤1 ulp)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    lo = r.astype(jnp.bfloat16)
    lo2 = (r - lo.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo, lo2


def _split_einsum(sub: str, one_hot, x) -> jnp.ndarray:
    """One-hot einsum of f32 values as three DEFAULT-precision bf16 passes.

    A HIGHEST-precision f32 einsum costs 6 MXU passes; the one-hot operand is
    exact in bf16, so gathering the hi/lo/lo2 split of the values (f32
    accumulate) reconstructs them to ≤1 ulp in half the passes."""
    hi, lo, lo2 = _split3(x)
    out = jnp.einsum(sub, one_hot, hi, precision=jax.lax.Precision.DEFAULT,
                     preferred_element_type=jnp.float32)
    out += jnp.einsum(sub, one_hot, lo, precision=jax.lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)
    out += jnp.einsum(sub, one_hot, lo2, precision=jax.lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)
    return out


@functools.lru_cache(maxsize=None)
def _gather_tpu_fn(kmajor: bool):
    """custom-VJP one-hot gather for f32 features on TPU.

    Forward AND backward (the one-hot transpose scatter of the cotangent) run
    as split-bf16 einsums — the autodiff default would run the backward einsum
    at the forward's HIGHEST precision (6 passes) for no gradient benefit."""
    import numpy as _np

    out_sub = "bmkn,bnc->bkmc" if kmajor else "bmkn,bnc->bmkc"
    bwd_sub = "bmkn,bkmc->bnc" if kmajor else "bmkn,bmkc->bnc"

    def one_hot_of(features, idx):
        return jax.nn.one_hot(idx, features.shape[1], dtype=jnp.bfloat16)

    @jax.custom_vjp
    def fn(features, idx):
        return _split_einsum(out_sub, one_hot_of(features, idx), features)

    def fwd(features, idx):
        return fn(features, idx), (features, idx)

    def bwd(res, g):
        features, idx = res
        dfeat = _split_einsum(bwd_sub, one_hot_of(features, idx),
                              g.astype(jnp.float32))
        return dfeat.astype(features.dtype), _np.zeros(idx.shape,
                                                       jax.dtypes.float0)

    fn.defvjp(fwd, bwd)
    return fn


def gather_neighbors(features: jnp.ndarray, idx: jnp.ndarray,
                     bit_exact: bool = False) -> jnp.ndarray:
    """Gather per-neighbour features: features (B, N, C), idx (B, M, K) -> (B, M, K, C).

    Equivalent of ``gcn3d.indexing_neighbor_new`` (:39-47).  This is the
    memory-bandwidth hot spot of the backbone (SURVEY.md §3.1 hot-loop 2).

    On TPU the generic XLA gather runs at ~31 GB/s effective; expressing the same
    gather as a one-hot einsum is far faster.  bf16 features gather bit-exactly
    in one DEFAULT pass; f32 features gather as a hi/lo/lo2 split in three
    DEFAULT passes (≤1 ulp; a HIGHEST einsum is 0-ULP but costs 6 passes both
    forward and — via autodiff — backward).  Other backends use the plain
    gather.
    """
    B, M, K = idx.shape
    if jax.devices()[0].platform == "tpu":
        if features.dtype == jnp.bfloat16 or bit_exact:
            # bf16: one DEFAULT pass is already 0-ULP.  bit_exact f32 (HIGHEST,
            # 6 passes): required where an exact-zero difference downstream
            # matters, e.g. rf of duplicated points must normalize to 0
            n = features.shape[1]
            one_hot = jax.nn.one_hot(idx, n, dtype=features.dtype)
            return jnp.einsum("bmkn,bnc->bmkc", one_hot, features,
                              precision=_gather_precision(features.dtype))
        return _gather_tpu_fn(kmajor=False)(features, idx)
    flat = idx.reshape(B, M * K)
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(B, M, K, features.shape[-1])


def gather_neighbors_kmajor(features: jnp.ndarray, idx: jnp.ndarray,
                            bit_exact: bool = False) -> jnp.ndarray:
    """Like :func:`gather_neighbors` but emits the k-major layout (B, K, M, C)
    the fused HS kernels consume — the einsum writes that layout for free,
    whereas transposing afterwards costs an HBM round trip of the full tensor."""
    B, M, K = idx.shape
    if jax.devices()[0].platform == "tpu":
        if features.dtype == jnp.bfloat16 or bit_exact:
            n = features.shape[1]
            one_hot = jax.nn.one_hot(idx, n, dtype=features.dtype)
            return jnp.einsum("bmkn,bnc->bkmc", one_hot, features,
                              precision=_gather_precision(features.dtype))
        return _gather_tpu_fn(kmajor=True)(features, idx)
    flat = idx.reshape(B, M * K)
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(B, M, K, features.shape[-1]).transpose(0, 2, 1, 3)


def neighbor_directions_normalized(vertices: jnp.ndarray, idx: jnp.ndarray,
                                   source: jnp.ndarray | None = None) -> jnp.ndarray:
    """Unit direction vectors to each neighbour (gcn3d.get_neighbor_direction_norm :49-59).

    vertices (B, N, 3), idx (B, N, K) -> (B, N, K, 3).
    Zero-length directions normalize to zero (torch F.normalize uses clamped norm).
    ``source`` (B, M, 3) gathers neighbour coordinates from a different (global)
    cloud — the sequence-parallel path, where ``idx`` holds source-global indices.
    """
    neighbors = gather_neighbors(vertices if source is None else source, idx,
                                 bit_exact=True)
    direction = neighbors - vertices[:, :, None, :]
    norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return direction / jnp.maximum(norm, 1e-12)


def neighbor_directions_normalized_kmajor(vertices: jnp.ndarray,
                                          idx: jnp.ndarray) -> jnp.ndarray:
    """K-major variant: (B, N, 3), (B, N, K) -> (B, K, N, 3) for the fused kernels."""
    neighbors = gather_neighbors_kmajor(vertices, idx, bit_exact=True)  # (B, K, N, 3)
    direction = neighbors - vertices[:, None, :, :]
    norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return direction / jnp.maximum(norm, 1e-12)

"""Hybrid-scope 3D-GCN layers (flax.linen, channel-last).

Re-designed from ``network/fs_net_repo/gcn3d.py`` for TPU:

* all features are (B, N, C) so the per-point linear maps are plain MXU matmuls;
* KNN index sets are computed once per resolution and *passed in* — the reference
  recomputes the identical vertex-KNN inside every layer's ORL branch and again in
  RF-P / pooling (12 O(N²) searches per forward, SURVEY.md §3.1); semantics are
  unchanged because the inputs are identical;
* the pooling subsample permutation takes an explicit PRNG key (reference:
  global ``torch.randperm``, gcn3d.py:243).

Reference layer semantics (gcn3d.py):
  HSlayer_surface :61-113   HS_layer :116-187   get_receptive_fields :189-209
  get_ORL_global :211-218   Pool_layer :220-246
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hspose_tpu.ops.knn import (
    gather_neighbors,
    knn_indices,
    neighbor_directions_normalized,
)


def torch_linear_init(fan_in: int):
    """torch nn.Linear/Conv default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def uniform_init(stdv: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)
    return init


def _ag_points(x: jnp.ndarray, sp_axis: Optional[str]) -> jnp.ndarray:
    """All-gather the point axis over the sequence-parallel mesh axis
    (identity when ``sp_axis`` is None)."""
    if sp_axis is None:
        return x
    return jax.lax.all_gather(x, sp_axis, axis=1, tiled=True)


def orl_global(feature: jnp.ndarray, orl_idx: jnp.ndarray,
               fast: bool = False, train: bool = False,
               f32x2: bool = False,
               sp_axis: Optional[str] = None,
               train_v4_small: bool = False) -> jnp.ndarray:
    """Outlier-robust global feature (gcn3d.get_ORL_global :211-218).

    KNN-max over each point's spatial neighbourhood, then a global mean broadcast
    back to every point.  ``orl_idx`` are vertex-KNN indices (B, N, K).
    TPU inference runs the fused Pallas kernel (``fast`` selects the bf16
    single-pass gather; otherwise the f32-faithful split gather) — the XLA path
    materializes (B, K, N, C) in HBM before the max.  Training keeps the XLA
    gather: at train batch (16) the tensors are small and the fused kernel's
    one-hot matmul FLOPs cost more than the HBM round-trip saves (measured,
    docs/PERFORMANCE.md).

    ``sp_axis``: sequence-parallel serving — ``feature``/``orl_idx`` hold this
    shard's query rows; the gather source is the all-gathered global feature
    map and the global mean is the pmean of the per-shard means (shards are
    equal-sized)."""
    src = _ag_points(feature, sp_axis)
    use_fused = (train is False
                 or (train_v4_small and feature.shape[1] <= 512))
    if use_fused and jax.devices()[0].platform == "tpu":
        from hspose_tpu.ops.pallas_hs_fused import orl_global_fused

        exact = False if fast else ("f32x2" if f32x2 else True)
        out = orl_global_fused(src, orl_idx, exact=exact)
    else:
        neigh = gather_neighbors(src, orl_idx)  # (B, N, K, C)
        fmax = jnp.max(neigh, axis=2)  # (B, N, C)
        out = jnp.mean(fmax, axis=1, keepdims=True)  # (B, 1, C)
    if sp_axis is not None:
        out = jax.lax.pmean(out, sp_axis)
    return out.astype(feature.dtype)


class HSLayerSurface(nn.Module):
    """First layer: learned support directions over raw surface geometry.

    Matches ``gcn3d.HSlayer_surface`` (:61-113): graph conv over RF-P receptive
    fields + ORL global branch + STE (1×1-conv shortcut on xyz).

    Memory note: the reference materializes the (B, N, K, S·C) theta tensor
    (gcn3d.py:101-105) — ~19 GB at batch 256.  With ``support_scan`` (default) the
    max-over-neighbours/mean-over-supports reduction runs as a scan over the S
    support directions, peaking at (B, N, K, C) instead — identical outputs.
    """

    kernel_num: int
    support_num: int
    dtype: jnp.dtype = jnp.float32
    support_scan: bool = True
    bwd_exact: bool = False
    infer_v3: bool = False  # debug: v3 pre-gathered kernels for f32 inference
    f32x2: bool = False  # serving tier: 2-term feature splits (~1.5e-5) in v4 kernels

    @nn.compact
    def __call__(self, vertices: jnp.ndarray, rf_idx: jnp.ndarray,
                 orl_idx: jnp.ndarray, train: bool = False,
                 sp_axis: Optional[str] = None,
                 verts_src: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        s, k = self.support_num, self.kernel_num
        directions = self.param("directions", uniform_init(1.0 / (s * k) ** 0.5), (3, s * k))
        ste = nn.Dense(k, use_bias=False, name="STE_layer",
                       kernel_init=torch_linear_init(3), dtype=self.dtype)
        conv2 = nn.Dense(k, use_bias=False, name="conv2",
                         kernel_init=torch_linear_init(2 * k), dtype=self.dtype)
        if sp_axis is not None:
            # sequence-parallel serving: this shard's query rows against the
            # all-gathered global cloud (idx values are source-global)
            assert verts_src is not None and not train and not self.infer_v3

        f_ste = ste(vertices)

        # graph conv (gcn3d.py:92-107)
        dir_norm = directions / jnp.maximum(
            jnp.linalg.norm(directions, axis=0, keepdims=True), 1e-12)
        dir_norm = dir_norm.astype(self.dtype)

        on_tpu = jax.devices()[0].platform == "tpu"
        if self.support_scan and on_tpu and not train and not self.infer_v3:
            # inference: fully-fused v4 kernel (in-kernel gather + rf), no HBM
            # round-trip of any (B,K,N,·) tensor; exact (split-gather + bf16x3)
            # when the compute dtype is f32, one-pass bf16 in fast mode
            from hspose_tpu.ops.pallas_hs_fused import hs_surface_fused

            feature = hs_surface_fused(
                vertices if verts_src is None else verts_src, rf_idx,
                dir_norm.astype(jnp.float32), s, k,
                exact=self.dtype == jnp.float32,
                vertices_q=vertices if verts_src is not None else None)
        elif self.support_scan and on_tpu:
            # training: the v3 custom-VJP kernel on pre-gathered k-major rf.
            # v4's in-kernel one-hot gathers cost O(N·C) MXU FLOPs per gathered
            # element — a bandwidth win at serve batch 256 but a 2-4x FLOPs
            # regression at train batch 16 (measured, docs/PERFORMANCE.md)
            from hspose_tpu.ops.knn import neighbor_directions_normalized_kmajor
            from hspose_tpu.ops.pallas_hs import hs_surface_reduce

            rf_km = neighbor_directions_normalized_kmajor(
                vertices.astype(self.dtype), rf_idx)  # (B, K, N, 3)
            feature = hs_surface_reduce(rf_km, dir_norm, s, k, kmajor=True,
                                        exact=self.dtype == jnp.float32,
                                        bwd_exact=self.bwd_exact)
        elif self.support_scan:
            rf_norm = neighbor_directions_normalized(vertices, rf_idx,
                                                     source=verts_src)  # (B, N, K, 3)
            dirs_s = dir_norm.reshape(3, s, k).transpose(1, 0, 2)  # (S, 3, C)

            def body(carry, dir_s):
                theta_s = jax.nn.relu(jnp.einsum("bnkd,dc->bnkc", rf_norm, dir_s))
                return carry + jnp.max(theta_s, axis=2), None

            total, _ = jax.lax.scan(
                body, jnp.zeros(rf_norm.shape[:2] + (k,), rf_norm.dtype), dirs_s,
                unroll=True)
            feature = total / s
        else:
            rf_norm = neighbor_directions_normalized(vertices, rf_idx,
                                                     source=verts_src)
            theta = jax.nn.relu(
                jnp.einsum("bnkd,ds->bnks", rf_norm, dir_norm))
            B, N, K = theta.shape[:3]
            theta = theta.reshape(B, N, K, s, k)
            feature = jnp.mean(jnp.max(theta, axis=2), axis=2)

        # ORL (gcn3d.py:109-113)
        f_global = orl_global(feature.astype(self.dtype), orl_idx,
                              fast=self.dtype == jnp.bfloat16,
                              train=train or self.infer_v3, f32x2=self.f32x2,
                              sp_axis=sp_axis)
        fused = jnp.concatenate(
            [feature.astype(self.dtype),
             jnp.broadcast_to(f_global, feature.shape[:2] + f_global.shape[-1:])],
            axis=-1)
        feature = conv2(fused) + feature
        return (feature + f_ste).astype(self.dtype)


class HSLayer(nn.Module):
    """General hybrid-scope layer (``gcn3d.HS_layer`` :116-187).

    Receptive fields are built in *feature* space (RF-F) — callers pass ``rf_idx``
    computed from the incoming feature map — while directions and the ORL branch use
    vertex geometry.
    """

    in_channel: int
    out_channel: int
    support_num: int
    dtype: jnp.dtype = jnp.float32
    support_scan: bool = True
    bwd_exact: bool = False
    bwd_store: bool = False  # backward skips theta/proj recompute (probe c)
    train_v4_small: bool = False  # v4 kernels for pooled-res training (probe d)
    infer_v3: bool = False  # debug: v3 pre-gathered kernels for f32 inference
    f32x2: bool = False  # serving tier: 2-term feature splits (~1.5e-5) in v4 kernels

    @nn.compact
    def __call__(self, vertices: jnp.ndarray, feature_map: jnp.ndarray,
                 rf_idx: jnp.ndarray, orl_idx: jnp.ndarray,
                 train: bool = False, sp_axis: Optional[str] = None,
                 verts_src: Optional[jnp.ndarray] = None,
                 feat_src: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        s, co = self.support_num, self.out_channel
        if sp_axis is not None:
            # sequence-parallel serving: local query rows, gathers address the
            # all-gathered global vertex/feature maps (idx are source-global)
            assert (verts_src is not None and feat_src is not None
                    and not train and not self.infer_v3 and self.support_scan)
        stdv = 1.0 / (co * (s + 1)) ** 0.5
        weights = self.param("weights", uniform_init(stdv), (self.in_channel, (s + 1) * co))
        bias = self.param("bias", uniform_init(stdv), ((s + 1) * co,))
        directions = self.param("directions", uniform_init(stdv), (3, s * co))
        ste = nn.Dense(co, use_bias=False, name="STE_layer",
                       kernel_init=torch_linear_init(self.in_channel), dtype=self.dtype)
        conv2 = nn.Dense(co, use_bias=False, name="conv2",
                         kernel_init=torch_linear_init(2 * co), dtype=self.dtype)

        f_ste = ste(feature_map)

        # graph conv (gcn3d.py:158-181)
        dir_norm = directions / jnp.maximum(
            jnp.linalg.norm(directions, axis=0, keepdims=True), 1e-12)
        dir_norm = dir_norm.astype(self.dtype)

        on_tpu = jax.devices()[0].platform == "tpu"
        # probe (d): at the pooled resolutions the v4 in-kernel gather's
        # O(N·C) one-hot cost is 4-16x smaller than at N=1028 — route
        # training through the (differentiable) v4 kernels when asked
        v4_train = (train and self.train_v4_small
                    and vertices.shape[1] <= 512)
        if (self.support_scan and on_tpu and not self.infer_v3
                and (not train or v4_train)):
            # inference (and v4_train): fully-fused v4 kernel (in-kernel
            # gather + rf); exact split-gather + bf16x3 when f32, one-pass
            # bf16 in fast mode
            from hspose_tpu.ops.pallas_hs_fused import hs_support_fused

            feature_center = (feature_map.astype(self.dtype)
                              @ weights[:, :co].astype(self.dtype) + bias[:co])
            support_exact = ("f32x2" if self.f32x2 else True) \
                if self.dtype == jnp.float32 else False
            activation = hs_support_fused(
                (feature_map if feat_src is None else feat_src).astype(self.dtype),
                vertices if verts_src is None else verts_src, rf_idx,
                weights[:, co:], bias[co:], dir_norm.astype(jnp.float32),
                s, co, exact=support_exact,
                vertices_q=vertices if verts_src is not None else None)
        elif self.support_scan and on_tpu:
            # training: v3 custom-VJP kernel on pre-gathered tensors (see the
            # surface layer's routing note — v4's in-kernel gathers are a FLOPs
            # regression at train batch)
            from hspose_tpu.ops.knn import (
                gather_neighbors_kmajor,
                neighbor_directions_normalized_kmajor,
            )
            from hspose_tpu.ops.pallas_hs import hs_support_reduce

            feature_center = (feature_map.astype(self.dtype)
                              @ weights[:, :co].astype(self.dtype) + bias[:co])
            rf_km = neighbor_directions_normalized_kmajor(
                vertices.astype(self.dtype), rf_idx)  # (B, K, N, 3)
            gathered_km = gather_neighbors_kmajor(feature_map.astype(self.dtype),
                                                  rf_idx)
            activation = hs_support_reduce(gathered_km, rf_km, weights[:, co:],
                                           bias[co:], dir_norm, s, co, kmajor=True,
                                           exact=self.dtype == jnp.float32,
                                           bwd_exact=self.bwd_exact,
                                           bwd_store=self.bwd_store)
        elif self.support_scan:
            rf_norm = neighbor_directions_normalized(vertices, rf_idx,
                                                     source=verts_src)  # (B, N, K, 3)
            feature_center = (feature_map.astype(self.dtype)
                              @ weights[:, :co].astype(self.dtype) + bias[:co])
            # gather-FIRST: since the support projection is linear, gathering the
            # input features once and projecting per support afterwards is
            # mathematically identical to the reference's project-then-gather —
            # one (B, N, K, Cin) gather instead of S, and the projections become
            # MXU matmuls on the gathered tensor.  The scan keeps the peak at
            # (B, N, K, co) instead of (B, N, K, s·co).
            dirs_s = dir_norm.reshape(3, s, co).transpose(1, 0, 2)  # (S, 3, co)
            w_s = (weights[:, co:].reshape(self.in_channel, s, co)
                   .transpose(1, 0, 2))  # (S, Cin, co)
            b_s = bias[co:].reshape(s, co)
            gathered_in = gather_neighbors(
                (feature_map if feat_src is None else feat_src).astype(self.dtype),
                rf_idx)

            def body(carry, inp):
                dir_s, w, bb = inp
                theta_s = jax.nn.relu(jnp.einsum("bnkd,dc->bnkc", rf_norm, dir_s))
                proj_s = jnp.einsum("bnki,ic->bnkc", gathered_in,
                                    w.astype(self.dtype)) + bb
                return carry + jnp.max(theta_s * proj_s, axis=2), None

            # fully unrolled: a rolled scan forces theta_s/proj_s to materialize in
            # HBM every iteration (~77 GB of avoidable traffic at batch 256)
            total, _ = jax.lax.scan(
                body, jnp.zeros(rf_norm.shape[:2] + (co,), rf_norm.dtype),
                (dirs_s, w_s, b_s), unroll=True)
            activation = total / s
        else:
            rf_norm = neighbor_directions_normalized(vertices, rf_idx)
            projected = (feature_map.astype(self.dtype)
                         @ weights.astype(self.dtype) + bias)
            feature_center = projected[..., :co]
            theta = jax.nn.relu(jnp.einsum("bnkd,ds->bnks", rf_norm, dir_norm))
            feature_support = gather_neighbors(projected[..., co:], rf_idx)
            act = theta * feature_support
            B, N, K = act.shape[:3]
            act = act.reshape(B, N, K, s, co)
            activation = jnp.mean(jnp.max(act, axis=2), axis=2)

        feature = feature_center + activation

        # ORL (gcn3d.py:183-187)
        f_global = orl_global(feature.astype(self.dtype), orl_idx,
                              fast=self.dtype == jnp.bfloat16,
                              train=train or self.infer_v3, f32x2=self.f32x2,
                              sp_axis=sp_axis,
                              train_v4_small=self.train_v4_small)
        fused = jnp.concatenate(
            [feature.astype(self.dtype),
             jnp.broadcast_to(f_global, feature.shape[:2] + f_global.shape[-1:])],
            axis=-1)
        feature = conv2(fused) + feature
        return (feature + f_ste).astype(self.dtype)


def pool_layer(key: jax.Array, vertices: jnp.ndarray, feature_map: jnp.ndarray,
               pool_idx: jnp.ndarray, pooling_rate: int = 4,
               sp_axis: Optional[str] = None,
               verts_src: Optional[jnp.ndarray] = None,
               feat_src: Optional[jnp.ndarray] = None):
    """Neighbour-max pooling + shared random subsample (gcn3d.Pool_layer :220-246).

    ``pool_idx``: vertex-KNN indices (B, N, 4).  The subsample permutation is drawn
    once from ``key`` and shared across the batch, exactly like the reference's
    ``randperm``.  Returns (vertices_pool, features_pool).

    Sequence-parallel: every device draws the SAME global permutation (the key
    is replicated), neighbour-max runs on local query rows against the global
    feature source, and each device keeps its contiguous slice of the sampled
    set — so the sharded pooled cloud is exactly the single-device pooled cloud
    partitioned along the mesh axis.
    """
    if sp_axis is None:
        n = vertices.shape[1]
        pool_num = n // pooling_rate
        sample = jax.random.permutation(key, n)[:pool_num]
        # neighbour-max only at the kept rows — the reference pools all n rows
        # then drops 3/4 of them (gcn3d.Pool_layer :232-240); restricting the
        # gather to the sampled rows is bitwise identical (rows independent)
        # and shrinks the (B, n, 4, C) intermediate 4x
        pooled = jnp.max(gather_neighbors(feature_map, pool_idx[:, sample, :]),
                         axis=2)
        return vertices[:, sample, :], pooled

    n_global = verts_src.shape[1]
    sp = n_global // vertices.shape[1]
    pooled_local = jnp.max(gather_neighbors(feat_src, pool_idx), axis=2)
    pooled_g = _ag_points(pooled_local, sp_axis)
    pool_num = n_global // pooling_rate
    if pool_num % sp:
        raise ValueError(f"pooled size {pool_num} does not shard over sp={sp}")
    sample = jax.random.permutation(key, n_global)[:pool_num]
    m = pool_num // sp
    start = jax.lax.axis_index(sp_axis) * m
    local_sample = jax.lax.dynamic_slice_in_dim(sample, start, m)
    return (jnp.take(verts_src, local_sample, axis=1),
            jnp.take(pooled_g, local_sample, axis=1))


def receptive_field_indices(feat_or_verts: jnp.ndarray, k: int) -> jnp.ndarray:
    """RF-P (point-distance) or RF-F (feature-distance) neighbour search
    (gcn3d.get_receptive_fields :189-209) — just KNN on whichever space is given."""
    return knn_indices(feat_or_verts, k)

"""Fully-fused fast-mode HS kernels: in-kernel gather + rf + support reduction.

The v3 kernels (``pallas_hs.py``) consume pre-gathered k-major tensors; the XLA
side then pays for the one-hot gather einsums, the (B,K,N,3) rf chain (whose
3-wide minor dim is lane-padded ~43x in HBM layout — pads/divides alone cost
~17 ms of the 224 ms bf16 forward), and the K/N padding copies.  Here ONE
program does everything for its query tile:

* the per-batch ``[features | xyz]`` block stays resident in VMEM across the
  query-tile grid axis (index map pins it, Mosaic fetches it once per batch);
* per real neighbour slot k (no K padding — padded slots never existed), a
  one-hot row matrix gathers features+xyz in a single MXU pass, the receptive-
  field direction is formed and normalized in-register, and theta/projection
  run for all supports at once as (TQ, S·Co) matmuls;
* a running max over k and a static per-support mean produce the output tile —
  nothing but the (TQ, Co) result ever touches HBM.

Numerics: one-hot entries are exact in bf16 and the MXU accumulates in f32, so
the gather itself is exact for bf16 features; theta/proj run one DEFAULT pass
each — this is the bf16 fast-inference path (``model.compute_dtype=bfloat16``).
Training and f32-exact eval keep the v3 custom-VJP kernels.

Replaces (reference): the gather+conv hot loop of ``gcn3d.py:39-47,92-187``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_BIG = -3.4e38


def _fused_support_kernel(f_ref, v_ref, vt_ref, idx_ref, w_ref, b_ref, d_ref,
                          o_ref, *, s: int, co: int, k: int):
    """f (1, n_pad, cin) + v (1, n_pad, 3) resident source blocks (kept separate:
    a concatenated cin+3 block lane-pads 259->512 and doubles the gather matmul
    at cin=256); vt (1, tq, 3) the tile's own xyz; idx (1, tq, k_pad) int32;
    w (cin, S·Co); b (1, S·Co); d (3, S·Co) -> out (1, tq, co)."""
    feat = f_ref[0]  # (n_pad, cin)
    verts = v_ref[0]  # (n_pad, 3)
    n_pad = feat.shape[0]
    tq = vt_ref.shape[1]
    cv = vt_ref[0].astype(jnp.float32)  # (tq, 3) centre xyz
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n_pad), 1)
    dflt = jax.lax.Precision.DEFAULT

    macc = jnp.full((tq, s * co), _NEG_BIG, jnp.float32)
    for j in range(k):  # static: only the real neighbour slots
        idx_j = idx_ref[0, :, j:j + 1]  # (tq, 1)
        onehot = (iota_n == idx_j).astype(jnp.bfloat16)
        gk = jnp.dot(onehot, feat, preferred_element_type=jnp.float32,
                     precision=dflt)  # exact gather: one-hot x bf16, f32 accum
        gxyz = jnp.dot(onehot, verts, preferred_element_type=jnp.float32,
                       precision=dflt)
        rf = gxyz - cv
        norm = jnp.sqrt(jnp.sum(rf * rf, axis=1, keepdims=True))
        rfn = rf / jnp.maximum(norm, 1e-12)
        proj = jnp.dot(gk.astype(jnp.bfloat16), w_ref[...],
                       preferred_element_type=jnp.float32, precision=dflt)
        proj = proj + b_ref[0:1]
        theta = jax.nn.relu(jnp.dot(rfn.astype(jnp.bfloat16), d_ref[...],
                                    preferred_element_type=jnp.float32,
                                    precision=dflt))
        macc = jnp.maximum(macc, theta * proj)

    acc = jnp.zeros((tq, co), jnp.float32)
    for j in range(s):
        acc = acc + macc[:, j * co:(j + 1) * co]
    o_ref[0] = acc / s


def _fused_surface_kernel(v_ref, vt_ref, idx_ref, d_ref, o_ref, *, s: int,
                          co: int, k: int):
    """v (1, n_pad, 3) resident xyz block; vt (1, tq, 3); idx (1, tq, k_pad);
    d (3, S·Co) -> out (1, tq, co): theta-only reduction."""
    verts = v_ref[0]  # (n_pad, 3)
    n_pad = verts.shape[0]
    tq = vt_ref.shape[1]
    cv = vt_ref[0].astype(jnp.float32)  # (tq, 3)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n_pad), 1)
    dflt = jax.lax.Precision.DEFAULT

    macc = jnp.full((tq, s * co), _NEG_BIG, jnp.float32)
    for j in range(k):
        idx_j = idx_ref[0, :, j:j + 1]
        onehot = (iota_n == idx_j).astype(jnp.bfloat16)
        gxyz = jnp.dot(onehot, verts, preferred_element_type=jnp.float32,
                       precision=dflt)
        rf = gxyz - cv
        norm = jnp.sqrt(jnp.sum(rf * rf, axis=1, keepdims=True))
        rfn = rf / jnp.maximum(norm, 1e-12)
        theta = jax.nn.relu(jnp.dot(rfn.astype(jnp.bfloat16), d_ref[...],
                                    preferred_element_type=jnp.float32,
                                    precision=dflt))
        macc = jnp.maximum(macc, theta)

    acc = jnp.zeros((tq, co), jnp.float32)
    for j in range(s):
        acc = acc + macc[:, j * co:(j + 1) * co]
    o_ref[0] = acc / s


def _orl_kernel(f_ref, idx_ref, o_ref, *, k: int, n_valid: int, tq: int):
    """Fused outlier-robust-global reduction: per point, max of its KNN rows,
    summed over the tile into a per-batch (1, C) accumulator (mean finished by
    the caller).  f (1, n_pad, C) resident; idx (1, tq, k_pad); o (1, 8, C)
    accumulated across the tile grid axis."""
    feat = f_ref[0]
    n_pad = feat.shape[0]
    c = feat.shape[1]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n_pad), 1)
    dflt = jax.lax.Precision.DEFAULT

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    macc = jnp.full((tq, c), _NEG_BIG, jnp.float32)
    for j in range(k):
        idx_j = idx_ref[0, :, j:j + 1]
        onehot = (iota_n == idx_j).astype(jnp.bfloat16)
        gk = jnp.dot(onehot, feat, preferred_element_type=jnp.float32,
                     precision=dflt)
        macc = jnp.maximum(macc, gk)

    # padded query rows gathered row 0's features — zero them before the sum
    row = pl.program_id(1) * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    macc = jnp.where(row < n_valid, macc, 0.0)
    o_ref[0, 0:1, :] += jnp.sum(macc, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tq", "interpret"))
def orl_global_fused(feature: jnp.ndarray, idx: jnp.ndarray, tq: int = 128,
                     interpret: bool = False) -> jnp.ndarray:
    """Fast-mode fused ORL global branch (gcn3d.get_ORL_global :211-218):
    feature (B, N, C) bf16, idx (B, N, K) -> (B, 1, C) = mean_n max_k feat[knn].

    The XLA path materializes the (B, K, N, C) gathered tensor in HBM before
    the max; here the per-batch feature block stays in VMEM and only the (1, C)
    accumulator is written."""
    B, N, C = feature.shape
    K = idx.shape[-1]
    nq = ((N + tq - 1) // tq) * tq
    n_src = ((N + 7) // 8) * 8
    k_pad = ((K + 127) // 128) * 128

    feat = _pad_axis(feature.astype(jnp.bfloat16), n_src, 1)
    idxp = _pad_axis(_pad_axis(idx.astype(jnp.int32), nq, 1), k_pad, 2)

    out = pl.pallas_call(
        functools.partial(_orl_kernel, k=K, n_valid=N, tq=tq),
        out_shape=jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
        grid=(B, nq // tq),
        in_specs=[
            pl.BlockSpec((1, n_src, C), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tq, k_pad), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, C), lambda i, j: (i, 0, 0)),
        interpret=interpret,
    )(feat, idxp)
    return out[:, 0:1, :] / N


def _pad_axis(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("support_num", "out_channel", "tq",
                                             "interpret"))
def hs_support_fused(feature_map: jnp.ndarray, vertices: jnp.ndarray,
                     idx: jnp.ndarray, weights: jnp.ndarray, bias: jnp.ndarray,
                     dirs: jnp.ndarray, support_num: int, out_channel: int,
                     tq: int = 128, interpret: bool = False) -> jnp.ndarray:
    """Fast-mode fused HS support reduction.

    feature_map (B, N, Cin) bf16, vertices (B, N, 3), idx (B, N, K) int32,
    weights (Cin, S·Co), bias (S·Co,), dirs (3, S·Co) -> (B, N, Co) f32.
    ``mean_s max_k relu(rf_norm·dir_s) · (feat[idx] @ W_s + b_s)`` with the
    gather and rf construction inside the kernel.
    """
    B, N, cin = feature_map.shape
    K = idx.shape[-1]
    s_co = support_num * out_channel
    nq = ((N + tq - 1) // tq) * tq  # query/output rows: tile multiple
    n_src = ((N + 7) // 8) * 8  # resident source rows: sublane multiple only
    k_pad = ((K + 127) // 128) * 128  # idx lane dim

    feat = _pad_axis(feature_map.astype(jnp.bfloat16), n_src, 1)
    verts_src = _pad_axis(vertices.astype(jnp.bfloat16), n_src, 1)
    verts_q = _pad_axis(vertices.astype(jnp.bfloat16), nq, 1)
    # pad query rows with self-index 0 (sliced off), idx lanes with 0 (unused:
    # the kernel loop runs only over the K real slots)
    idxp = _pad_axis(_pad_axis(idx.astype(jnp.int32), nq, 1), k_pad, 2)

    out = pl.pallas_call(
        functools.partial(_fused_support_kernel, s=support_num, co=out_channel,
                          k=K),
        out_shape=jax.ShapeDtypeStruct((B, nq, out_channel), jnp.float32),
        grid=(B, nq // tq),
        in_specs=[
            pl.BlockSpec((1, n_src, cin), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_src, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tq, k_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((cin, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((3, s_co), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, out_channel), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(feat, verts_src, verts_q, idxp, weights, bias.reshape(1, -1), dirs)
    return out[:, :N]


@functools.partial(jax.jit, static_argnames=("support_num", "out_channel", "tq",
                                             "interpret"))
def hs_surface_fused(vertices: jnp.ndarray, idx: jnp.ndarray, dirs: jnp.ndarray,
                     support_num: int, out_channel: int, tq: int = 256,
                     interpret: bool = False) -> jnp.ndarray:
    """Fast-mode fused surface-layer reduction: vertices (B, N, 3),
    idx (B, N, K), dirs (3, S·Co) -> (B, N, Co) f32."""
    B, N, _ = vertices.shape
    K = idx.shape[-1]
    s_co = support_num * out_channel
    nq = ((N + tq - 1) // tq) * tq
    n_src = ((N + 7) // 8) * 8
    k_pad = ((K + 127) // 128) * 128

    verts_src = _pad_axis(vertices.astype(jnp.bfloat16), n_src, 1)
    verts_q = _pad_axis(vertices.astype(jnp.bfloat16), nq, 1)
    idxp = _pad_axis(_pad_axis(idx.astype(jnp.int32), nq, 1), k_pad, 2)

    out = pl.pallas_call(
        functools.partial(_fused_surface_kernel, s=support_num, co=out_channel,
                          k=K),
        out_shape=jax.ShapeDtypeStruct((B, nq, out_channel), jnp.float32),
        grid=(B, nq // tq),
        in_specs=[
            pl.BlockSpec((1, n_src, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tq, k_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((3, s_co), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, out_channel), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(verts_src, verts_q, idxp, dirs)
    return out[:, :N]

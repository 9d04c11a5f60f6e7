"""Fused Pallas KNN kernel: pairwise distances + k-smallest selection on-chip.

Why: XLA's sort-based ``top_k`` dominates the backbone's runtime (~106-138 ms per
(256, 1028, 1028) selection on v5e — ~80× the HBM bandwidth bound).  This kernel
keeps a (TQ, N) distance tile in VMEM (computed on the MXU/VPU from the raw
points/features) and extracts the k smallest per row by iterative masked min — k
vector reductions instead of a full sort, never materializing the B·N² matrix in
HBM.

Semantics match ``ops.knn.knn_indices`` (reference ``gcn3d.get_neighbor_index``
:15-24): k+1 smallest including self, self dropped by the caller.  Ties resolve to
the lowest index (first occurrence), like a stable sort.

``fast=True`` packs the candidate index into the low 11 mantissa bits of the
(clamped non-negative) distance, so each extraction is ONE min-reduction + one
mask instead of two reductions + two selects.  Distances are effectively
truncated to ~2⁻¹² relative precision — neighbours whose distances differ by less
than that may swap.  Tie-break (lowest index) is preserved by construction.  Used
by the bf16 fast inference mode; exact mode keeps the 4-pass extraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38  # python float: jnp scalars may not be captured by kernels
_IDX_BITS = 11  # supports Npad <= 2048
_IDX_MASK = (1 << _IDX_BITS) - 1
_INT_BIG = 2**31 - 1


def _distance_tile(x, q, use_mxu: bool, fast: bool):
    """(TQ, Npad) squared distances from q (TQ, D) to x (Npad, D)."""
    tq, npad = q.shape[0], x.shape[0]
    if use_mxu:
        # Mosaic supports DEFAULT/HIGHEST only; fast mode takes the bf16 pass
        prec = (jax.lax.Precision.DEFAULT if fast
                else jax.lax.Precision.HIGHEST)
        inner = jax.lax.dot_general(
            q, x, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        q_sq = jnp.sum(q.astype(jnp.float32) * q.astype(jnp.float32), axis=-1,
                       keepdims=True)
        x_sq = jnp.sum(x.astype(jnp.float32) * x.astype(jnp.float32), axis=-1)
        return q_sq + x_sq[None, :] - 2.0 * inner
    # low-D (xyz) path: 3 fused VPU passes beat a D=3 MXU contraction
    d = jnp.zeros((tq, npad), jnp.float32)
    for dim in range(q.shape[1]):
        diff = q[:, dim:dim + 1].astype(jnp.float32) - x[:, dim].astype(jnp.float32)[None, :]
        d = d + diff * diff
    return d


def _knn_kernel(x_ref, q_ref, out_ref, *, k: int, n_valid: int, use_mxu: bool):
    """One (batch, query-tile) program: exact 4-pass extraction.

    x_ref: (1, Npad, D) all source points in VMEM;
    q_ref: (1, TQ, D) query tile; out_ref: (1, TQ, k) int32 neighbour indices.
    """
    x = x_ref[0]  # (Npad, D)
    q = q_ref[0]  # (TQ, D)
    npad = x.shape[0]
    tq = q.shape[0]
    d = _distance_tile(x, q, use_mxu, fast=False)

    col = jax.lax.broadcasted_iota(jnp.int32, (tq, npad), 1)
    d = jnp.where(col < n_valid, d, _BIG)  # mask padded source points

    def extract(j, carry):
        d = carry
        m = jnp.min(d, axis=1, keepdims=True)  # (TQ, 1)
        # first-occurrence argmin via index-min over the tie set
        idx = jnp.min(jnp.where(d <= m, col, npad), axis=1)  # (TQ,)
        out_ref[0, :, j] = idx
        d = jnp.where(col == idx[:, None], _BIG, d)
        return d

    jax.lax.fori_loop(0, k, extract, d, unroll=True)


def _knn_kernel_fast(x_ref, q_ref, out_ref, *, k: int, n_valid: int,
                     use_mxu: bool):
    """Packed-key extraction: ONE int-min reduction + one mask per neighbour.

    key = (bitcast(max(d,0)) & ~IDX_MASK) | col — monotone in d for d ≥ 0, so the
    row-min of key is the (distance-truncated) nearest neighbour with lowest-index
    tie-break, and the index decodes as key & IDX_MASK.
    """
    x = x_ref[0]
    q = q_ref[0]
    npad = x.shape[0]
    tq = q.shape[0]
    d = _distance_tile(x, q, use_mxu, fast=True)

    col = jax.lax.broadcasted_iota(jnp.int32, (tq, npad), 1)
    d_bits = jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0), jnp.int32)
    key = jnp.where(col < n_valid, (d_bits & ~_IDX_MASK) | col, _INT_BIG)

    def extract(j, carry):
        key = carry
        m = jnp.min(key, axis=1)  # (TQ,)
        out_ref[0, :, j] = m & _IDX_MASK
        key = jnp.where(key == m[:, None], _INT_BIG, key)
        return key

    jax.lax.fori_loop(0, k, extract, key, unroll=True)


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3, 4))
@functools.partial(jax.jit, static_argnames=("k", "tq", "interpret", "fast"))
def knn_indices_pallas(points: jnp.ndarray, k: int, tq: int = 128,
                       interpret: bool = False, fast: bool = False) -> jnp.ndarray:
    """Indices of the k nearest neighbours excluding self: (B, N, D) -> (B, N, k).

    Drop-in replacement for ``ops.knn.knn_indices`` built on the fused kernel.
    Integer outputs carry no tangents; the custom_jvp below makes that explicit so
    the kernel can sit inside differentiated training graphs (pallas_call itself
    has no autodiff rule).
    """
    B, N, D = points.shape
    npad = ((N + 127) // 128) * 128
    nq = ((N + tq - 1) // tq) * tq
    dtype = points.dtype if points.dtype == jnp.bfloat16 else jnp.float32
    # pad source with far-away sentinels, queries with zeros (rows sliced off)
    x = _pad_to(points.astype(dtype), npad, 1)
    q = _pad_to(points.astype(dtype), nq, 1)
    use_mxu = D > 8
    if not use_mxu and D < 3:
        raise ValueError("D must be >= 3")
    if fast and npad > (1 << _IDX_BITS):
        fast = False  # index no longer fits the packed key; fall back to exact

    kk = k + 1  # include self, dropped below
    kernel = _knn_kernel_fast if fast else _knn_kernel
    grid = (B, nq // tq)
    out = pl.pallas_call(
        functools.partial(kernel, k=kk, n_valid=N, use_mxu=use_mxu),
        out_shape=jax.ShapeDtypeStruct((B, nq, kk), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, npad, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tq, D), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, kk), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(x, q)
    return out[:, :N, 1:]


@knn_indices_pallas.defjvp
def _knn_indices_jvp(k, tq, interpret, fast, primals, tangents):
    import numpy as _np

    (points,) = primals
    out = knn_indices_pallas(points, k, tq, interpret, fast)
    tangent = _np.zeros(out.shape, dtype=jax.dtypes.float0)
    return out, tangent

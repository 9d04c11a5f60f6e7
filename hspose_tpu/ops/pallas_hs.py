"""Fused Pallas kernel for the hybrid-scope support reduction.

The HS graph conv computes, per point and output channel,
``mean_s max_k relu(rf·dir_s) · (gathered @ W_s + b_s)`` — the reference
materializes the (B, N, K, S·C) theta and support tensors in HBM
(gcn3d.py:167-179), and even a scan-over-supports XLA version writes ~77 GB of
intermediates per layer at batch 256.  Here one program holds a (TQ·K, ·) tile in
VMEM, runs the per-support projections on the MXU and the relu·max·mean reduction
on the VPU, and writes only the (TQ, C) result.

Layout notes:
* K is padded to a multiple of 8 sublanes (``_K_ALIGN``) so the (TQ·K, C) ↔
  (TQ, K, C) reshapes are layout-preserving — with the raw K=20 every reshape is a
  Mosaic relayout and dominates the kernel.
* Padded neighbour slots are masked to −inf before the max.
* theta is computed on the VPU (a D=3 MXU contraction wastes full passes).

Two modes:
* ``hs_support_reduce``  — full HS_layer body (with projection matmuls);
* ``hs_surface_reduce``  — HSlayer_surface body (theta-only, no projection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K_ALIGN = 8
_NEG = -3.4e38


def _pad_k(x, k_pad):
    pad = k_pad - x.shape[2]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[2] = (0, pad)
    return jnp.pad(x, widths)


def _pad_n(x, n_pad):
    pad = n_pad - x.shape[1]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[1] = (0, pad)
    return jnp.pad(x, widths)


def _k_mask(tq: int, k_pad: int, k_valid: int, co: int):
    """(tq·k_pad, co) additive mask: 0 for real neighbour slots, −inf for padding."""
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (tq * k_pad, co), 0) % k_pad
    return jnp.where(k_ids < k_valid, 0.0, _NEG)


def _reduce_kernel(g_ref, rf_ref, w_ref, b_ref, d_ref, o_ref, *, s: int, co: int,
                   k_pad: int, k_valid: int, exact: bool):
    """gathered (1, TQ·Kp, Cin), rf (1, TQ·Kp, 3), w (Cin, S*Co), b (1, S*Co),
    dirs (3, S*Co) -> out (1, TQ, Co)."""
    rows = g_ref.shape[1]
    tq = rows // k_pad
    g = g_ref[0]
    rf = rf_ref[0]
    mask = _k_mask(tq, k_pad, k_valid, co)

    if exact:
        # manual bf16x3: f32-accurate (rel err ~1e-7) at 3 MXU passes instead of
        # the 6 that Precision.HIGHEST costs (the kernel is MXU-bound)
        g_hi = g.astype(jnp.bfloat16)
        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(j, acc):
        off = pl.multiple_of(j * co, co)
        w_s = w_ref[:, pl.ds(off, co)]
        d_s = d_ref[:, pl.ds(off, co)]
        if exact:
            w_hi = w_s.astype(jnp.bfloat16)
            w_lo = (w_s - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dflt = jax.lax.Precision.DEFAULT  # global default may be 'high' (unsupported in Mosaic)
            proj = (jnp.dot(g_hi, w_hi, preferred_element_type=jnp.float32, precision=dflt)
                    + jnp.dot(g_hi, w_lo, preferred_element_type=jnp.float32, precision=dflt)
                    + jnp.dot(g_lo, w_hi, preferred_element_type=jnp.float32, precision=dflt))
        else:
            proj = jnp.dot(g, w_s, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
        proj = proj + b_ref[0, pl.ds(off, co)]
        theta = jax.nn.relu(rf[:, 0:1] * d_s[0][None, :]
                            + rf[:, 1:2] * d_s[1][None, :]
                            + rf[:, 2:3] * d_s[2][None, :])
        prod = theta * proj + mask
        return acc + jnp.max(prod.reshape(tq, k_pad, co), axis=1)

    acc = jax.lax.fori_loop(0, s, body, jnp.zeros((tq, co), jnp.float32))
    o_ref[0] = acc / s


def _surface_kernel(rf_ref, d_ref, o_ref, *, s: int, co: int, k_pad: int,
                    k_valid: int):
    rows = rf_ref.shape[1]
    tq = rows // k_pad
    rf = rf_ref[0]
    mask = _k_mask(tq, k_pad, k_valid, co)

    def body(j, acc):
        off = pl.multiple_of(j * co, co)
        d_s = d_ref[:, pl.ds(off, co)]
        theta = jax.nn.relu(rf[:, 0:1] * d_s[0][None, :]
                            + rf[:, 1:2] * d_s[1][None, :]
                            + rf[:, 2:3] * d_s[2][None, :])
        return acc + jnp.max((theta + mask).reshape(tq, k_pad, co), axis=1)

    acc = jax.lax.fori_loop(0, s, body, jnp.zeros((tq, co), jnp.float32))
    o_ref[0] = acc / s


def _prep(gathered, rf_norm, tq):
    """Pad K to the sublane multiple and N to the tile multiple; flatten (N, K)."""
    B, N, K = rf_norm.shape[:3]
    k_pad = ((K + _K_ALIGN - 1) // _K_ALIGN) * _K_ALIGN
    n_pad = ((N + tq - 1) // tq) * tq
    rf = _pad_n(_pad_k(rf_norm, k_pad), n_pad).reshape(B, n_pad * k_pad, 3)
    out = [rf, k_pad, n_pad]
    if gathered is not None:
        g = _pad_n(_pad_k(gathered, k_pad), n_pad)
        g = g.reshape(B, n_pad * k_pad, gathered.shape[-1])
        out.insert(0, g)
    return out


@functools.partial(jax.jit, static_argnames=("support_num", "out_channel", "tq",
                                             "exact", "interpret"))
def hs_support_reduce(gathered: jnp.ndarray, rf_norm: jnp.ndarray,
                      weights: jnp.ndarray, bias: jnp.ndarray, dirs: jnp.ndarray,
                      support_num: int, out_channel: int, tq: int = 64,
                      exact: bool = True, interpret: bool = False) -> jnp.ndarray:
    """gathered (B, N, K, Cin), rf_norm (B, N, K, 3), weights (Cin, S*Co),
    bias (S*Co,), dirs (3, S*Co) -> (B, N, Co)."""
    B, N, K, Cin = gathered.shape
    g, rf, k_pad, n_pad = _prep(gathered, rf_norm, tq)
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, s=support_num, co=out_channel,
                          k_pad=k_pad, k_valid=K, exact=exact),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, out_channel), jnp.float32),
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, tq * k_pad, Cin), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tq * k_pad, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((Cin, support_num * out_channel), lambda i, j: (0, 0)),
            pl.BlockSpec((1, support_num * out_channel), lambda i, j: (0, 0)),
            pl.BlockSpec((3, support_num * out_channel), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, out_channel), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(g, rf, weights, bias.reshape(1, -1), dirs)
    return out[:, :N]


@functools.partial(jax.jit, static_argnames=("support_num", "out_channel", "tq",
                                             "interpret"))
def hs_surface_reduce(rf_norm: jnp.ndarray, dirs: jnp.ndarray, support_num: int,
                      out_channel: int, tq: int = 128,
                      interpret: bool = False) -> jnp.ndarray:
    """rf_norm (B, N, K, 3), dirs (3, S*C) -> (B, N, C) theta-only reduction."""
    B, N, K, _ = rf_norm.shape
    rf, k_pad, n_pad = _prep(None, rf_norm, tq)
    out = pl.pallas_call(
        functools.partial(_surface_kernel, s=support_num, co=out_channel,
                          k_pad=k_pad, k_valid=K),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, out_channel), jnp.float32),
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, tq * k_pad, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((3, support_num * out_channel), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, out_channel), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(rf, dirs)
    return out[:, :N]

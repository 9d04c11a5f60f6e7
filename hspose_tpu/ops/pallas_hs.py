"""Fused Pallas kernels for the hybrid-scope support reduction.

The HS graph conv computes, per point and output channel,
``mean_s max_k relu(rf·dir_s) · (gathered @ W_s + b_s)`` — the reference
materializes the (B, N, K, S·C) theta and support tensors in HBM
(gcn3d.py:167-179); even a scan-over-supports XLA version writes ~77 GB of
intermediates per layer at batch 256.  Here one program holds the tile in VMEM and
writes only the (TQ, C) result.

Kernel design (v3):
* Neighbour tensors arrive **k-major**: (B, K, N, C) flattened to
  (k_pad, tq, C) tiles.  The max-over-K is then a reduction over the *leading*
  axis — pure cross-vreg ``vmax`` ops, no sublane relayout — and padded K slots
  are simply excluded by a static slice (``[:k_valid]``), removing the −inf mask
  pass entirely.  (v1 used (tq·k_pad, C) rows with K strided inside sublane
  groups; Mosaic relayouts on the (tq, k_pad, co) max dominated the kernel.)
* theta runs on the VPU in f32 (exact; a K=3 MXU contraction wastes a full
  systolic pass, and six at HIGHEST — both measured slower).
* a rolled loop over supports keeps temporaries (rows, Co)-sized; an
  all-supports (rows, S·Co) variant forces tiny tiles and measured slower.

Precision: ``exact=True`` uses a manual bf16x3 split for the projection (f32
accurate, 3 MXU passes — ``Precision.HIGH`` does not exist inside Mosaic);
``exact=False`` (fast mode) runs it at DEFAULT (one bf16 pass); inputs may be
bf16.

Both reductions are differentiable: ``jax.custom_vjp`` pairs each forward with a
fused backward kernel (see ``_support_bwd_kernel``) so training uses the same
fast path — the reference trains this op end-to-end
(``network/fs_net_repo/gcn3d.py:92-187``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K_ALIGN = 8
# VMEM budget for the per-program temporaries (theta/proj/prod + inputs); the
# chip has ~16 MB more headroom is left for Mosaic's own buffers/pipelining.
_VMEM_BUDGET = 13 * 1024 * 1024


def _pad_axis(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_tq(tq_req: int, k_pad: int, cin: int, co: int, s_co: int,
             extra_q_bytes: int = 0) -> int:
    """Largest tq ≤ tq_req (multiple of 8) whose temporaries fit the VMEM budget.

    The rolled support loop keeps (rows, Co) temporaries only: per row we hold the
    gathered tile + its bf16 hi/lo splits (cin·8), ~4 live (rows, co) f32 arrays
    (theta/proj/prod/acc) and the lane-padded rf tile (512 B); plus the full
    weight matrix once.  ``extra_q_bytes``: additional per-QUERY-row bytes for
    optional output blocks (e.g. the bwd_store twin/pwin residuals, which
    Mosaic double-buffers)."""
    tq = max(8, (tq_req // 8) * 8)
    while tq > 8:
        rows = tq * k_pad
        bytes_needed = (rows * (cin * 8 + co * 16 + 512) + cin * s_co * 4
                        + tq * extra_q_bytes)
        if bytes_needed <= _VMEM_BUDGET:
            break
        tq -= 8
    return tq


def _pick_tq_bwd(tq_fwd: int, n_pad: int, k_pad: int, cin: int, co: int,
                 s_co: int) -> int:
    """Backward tile: the largest multiple-of-8 divisor of n_pad (≤ forward tq)
    that fits the bwd footprint (per row: g + dg + bf16 splits ≈ cin·12, ~6 live
    (rows, co) f32 temporaries ≈ co·24, rf/drf ≈ 512 B; fixed: W and dW once
    each).  Mosaic requires the sublane block dim be a multiple of 8.

    Probe override: ``HSPOSE_BWD_TQ=<n_pad>:<tq>[,<n_pad>:<tq>…]`` forces the
    tile for matching n_pad values — the in-step tile-sweep hook (isolated
    kernel calls are dispatch-dominated on the tunneled rig, so sweeps run
    through the full train step)."""
    import os
    override = os.environ.get("HSPOSE_BWD_TQ")
    if override:
        for part in override.split(","):
            np_s, tq_s = part.split(":")
            if int(np_s) == n_pad:
                return int(tq_s)
    best = 8
    # tighter budget than the forward: Mosaic double-buffers the in/out blocks
    # (dg/drf/gbar), which the per-row estimate doesn't see — measured ~25% over
    budget = 8 * 1024 * 1024
    for tq in range(8, tq_fwd + 1, 8):
        if n_pad % tq != 0:
            continue
        rows = tq * k_pad
        bytes_needed = (rows * (cin * 12 + co * 24 + 512) + cin * s_co * 8
                        + tq * s_co * 8)  # + the double-buffered win block
        if bytes_needed <= budget:
            best = tq
    return best


def _to_kmajor(x):
    """(B, N, K, C) -> (B, K, N, C)."""
    return jnp.transpose(x, (0, 2, 1, 3))


def _bf16x3_dot(a, w):
    """f32-accurate matmul from three bf16 MXU passes (rel err ~1e-7)."""
    dflt = jax.lax.Precision.DEFAULT  # global default may be 'high' (unsupported in Mosaic)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w_hi = w.astype(jnp.bfloat16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(a_hi, w_hi, preferred_element_type=jnp.float32, precision=dflt)
            + jnp.dot(a_hi, w_lo, preferred_element_type=jnp.float32, precision=dflt)
            + jnp.dot(a_lo, w_hi, preferred_element_type=jnp.float32, precision=dflt))


def _theta_vpu(rf, d_ref, off, co):
    """relu(rf·dir) on the VPU: exact f32, no MXU passes (but the (rows,1) lane
    broadcasts cost ~9 VPU passes per support — see _theta for the trade)."""
    d0 = d_ref[0:1, pl.ds(off, co)]
    d1 = d_ref[1:2, pl.ds(off, co)]
    d2 = d_ref[2:3, pl.ds(off, co)]
    rf32 = rf.astype(jnp.float32)
    return jax.nn.relu(rf32[:, 0:1] * d0 + rf32[:, 1:2] * d1 + rf32[:, 2:3] * d2)


def _theta(rf, d_ref, off, co, *, exact: bool, mxu: bool):
    """relu(rf·dir_s): VPU (exact f32, VPU-pass heavy) or MXU (pipelines with the
    VPU max; bf16x3 when exact, one DEFAULT pass when fast)."""
    if not mxu:
        return _theta_vpu(rf, d_ref, off, co)
    d_s = d_ref[:, pl.ds(off, co)]
    if exact:
        return jax.nn.relu(_bf16x3_dot(rf.astype(jnp.float32), d_s))
    return jax.nn.relu(jnp.dot(rf, d_s.astype(rf.dtype),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT))


def _support_kernel(g_ref, rf_ref, w_ref, b_ref, d_ref, o_ref, *args, s: int,
                    co: int, k_valid: int, exact: bool, theta_mxu: bool = True,
                    want_win: bool = False, want_vals: bool = False):
    """g (1, Kp, TQ, Cin), rf (1, Kp, TQ, 3), w (Cin, S·Co), b (1, S·Co),
    d (3, S·Co) -> out (1, TQ, Co) [+ win (1, TQ, S·Co) i32 when want_win,
    + twin/pwin (1, TQ, S·Co) f32 when want_vals].

    Rolled loop over supports keeps the temporaries (rows, Co)-sized (an all-
    supports (rows, S·Co) version forces tiny tiles — measured slower), while the
    k-major max stays a pure cross-vreg reduction.  ``want_win`` additionally
    records the first-occurrence argmax-over-k per (point, channel) — the
    backward selects by this instead of recomputing the winner, so a
    reduced-precision backward cannot misattribute gradients on near-ties.
    ``want_vals`` also stores the winner's theta and proj values so the
    backward can skip BOTH recomputes (probe (c) of the round-5 train-step
    campaign — trades 2 (B, N, S·Co) f32 residuals of HBM for one big MXU
    pass per support in the backward).
    """
    win_ref = args[0] if want_win else None
    twin_ref = args[1] if want_vals else None
    pwin_ref = args[2] if want_vals else None
    kp, tq, cin = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    g = g_ref[0].reshape(kp * tq, cin)
    rf = rf_ref[0].reshape(kp * tq, 3)

    if exact:
        g_hi = g.astype(jnp.bfloat16)
        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if want_win:
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (kp, tq, co), 0)

    def body(j, acc):
        off = pl.multiple_of(j * co, co)
        w_s = w_ref[:, pl.ds(off, co)]
        if exact:
            dflt = jax.lax.Precision.DEFAULT
            w_hi = w_s.astype(jnp.bfloat16)
            w_lo = (w_s - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            proj = (jnp.dot(g_hi, w_hi, preferred_element_type=jnp.float32, precision=dflt)
                    + jnp.dot(g_hi, w_lo, preferred_element_type=jnp.float32, precision=dflt)
                    + jnp.dot(g_lo, w_hi, preferred_element_type=jnp.float32, precision=dflt))
        else:
            proj = jnp.dot(g, w_s, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
        proj = proj + b_ref[0:1, pl.ds(off, co)]
        theta = _theta(rf, d_ref, off, co, exact=exact, mxu=theta_mxu)
        prod = (theta * proj).reshape(kp, tq, co)
        m = jnp.max(prod[:k_valid], axis=0)  # cross-vreg maxes only
        if want_win:
            eq = jnp.logical_and(prod >= m[None], k_iota < k_valid)
            ik = jnp.min(jnp.where(eq, k_iota, kp), axis=0)
            win_ref[0, :, pl.ds(off, co)] = ik
            if want_vals:
                sel = (k_iota == ik[None]).astype(jnp.float32)
                twin_ref[0, :, pl.ds(off, co)] = jnp.sum(
                    theta.reshape(kp, tq, co) * sel, axis=0)
                pwin_ref[0, :, pl.ds(off, co)] = jnp.sum(
                    proj.reshape(kp, tq, co) * sel, axis=0)
        return acc + m

    acc = jax.lax.fori_loop(0, s, body, jnp.zeros((tq, co), jnp.float32))
    o_ref[0] = acc / s


def _surface_kernel(rf_ref, d_ref, o_ref, *args, s: int, co: int, k_valid: int,
                    exact: bool, theta_mxu: bool = True,
                    want_win: bool = False):
    """rf (1, Kp, TQ, 3), d (3, S·Co) -> out (1, TQ, Co) [+ win]: theta-only
    reduction."""
    win_ref = args[0] if want_win else None
    kp, tq = rf_ref.shape[1], rf_ref.shape[2]
    rf = rf_ref[0].reshape(kp * tq, 3)
    if want_win:
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (kp, tq, co), 0)

    def body(j, acc):
        off = pl.multiple_of(j * co, co)
        theta = _theta(rf, d_ref, off, co, exact=exact, mxu=theta_mxu).reshape(kp, tq, co)
        m = jnp.max(theta[:k_valid], axis=0)
        if want_win:
            eq = jnp.logical_and(theta >= m[None], k_iota < k_valid)
            win_ref[0, :, pl.ds(off, co)] = jnp.min(
                jnp.where(eq, k_iota, kp), axis=0)
        return acc + m

    acc = jax.lax.fori_loop(0, s, body, jnp.zeros((tq, co), jnp.float32))
    o_ref[0] = acc / s


def _support_bwd_kernel(g_ref, rf_ref, w_ref, b_ref, d_ref, win_ref, gbar_ref,
                        dg_ref, drf_ref, dw_ref, db_ref, dd_ref, *, s: int,
                        co: int, k_valid: int, exact: bool):
    """Backward of the support reduction.

    Recomputes theta/proj per support (cheaper than storing (B,K,N,S·Co)
    residuals) and selects the winning k per (point, channel) from the
    forward-recorded ``win`` residual — exact selection regardless of the
    backward's matmul precision.  dw/db/dd use constant-index output blocks
    accumulated across the sequentially-executed grid (zeroed at program
    (0,0)); dg/drf are per-tile writes.
    """
    kp, tq, cin = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    rows = kp * tq
    g = g_ref[0].reshape(rows, cin).astype(jnp.float32)
    rf = rf_ref[0].reshape(rows, 3).astype(jnp.float32)
    gb = gbar_ref[0] / s  # (tq, co)

    is_first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(is_first)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dd_ref[:] = jnp.zeros_like(dd_ref)

    if exact:
        g_hi = g.astype(jnp.bfloat16)
        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dflt = jax.lax.Precision.DEFAULT

    def mm(a, b, dims):
        """f32-faithful (bf16x3) or one-pass matmul depending on `exact`."""
        if not exact:
            return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=dflt)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(a_hi, b_hi, dimension_numbers=(dims, ((), ())),
                                  preferred_element_type=jnp.float32, precision=dflt)
        out += jax.lax.dot_general(a_hi, b_lo, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32, precision=dflt)
        out += jax.lax.dot_general(a_lo, b_hi, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32, precision=dflt)
        return out

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (kp, tq, co), 0)

    def body(j, carry):
        dg_acc, drf_acc = carry
        off = pl.multiple_of(j * co, co)
        w_s = w_ref[:, pl.ds(off, co)]
        if exact:
            w_hi = w_s.astype(jnp.bfloat16)
            w_lo = (w_s - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            proj = (jnp.dot(g_hi, w_hi, preferred_element_type=jnp.float32, precision=dflt)
                    + jnp.dot(g_hi, w_lo, preferred_element_type=jnp.float32, precision=dflt)
                    + jnp.dot(g_lo, w_hi, preferred_element_type=jnp.float32, precision=dflt))
        else:
            proj = jnp.dot(g, w_s, preferred_element_type=jnp.float32, precision=dflt)
        proj = proj + b_ref[0:1, pl.ds(off, co)]
        # VPU theta for the exact backward (bit-matches the forward's relu
        # gate); one MXU pass in fast mode — values only, selection is the
        # forward-recorded winner either way
        theta = _theta(rf, d_ref, off, co, exact=exact, mxu=not exact)
        # winning k per (point, channel): recorded by the forward (exact
        # arithmetic) — a reduced-precision recompute here would route the
        # gradient to the wrong neighbour on near-ties
        ik = win_ref[0, :, pl.ds(off, co)]  # (tq, co)
        sel = (k_iota == ik[None]).astype(jnp.float32)  # one-hot over k
        dprod = (sel * gb[None]).reshape(rows, co)
        dpi = dprod * theta
        du = jnp.where(theta > 0, dprod * proj, 0.0)
        # dg += dpi @ W_s^T   (contract co)
        dg_acc = dg_acc + mm(dpi, w_s, ((1,), (1,)))
        # drf += du @ d_s^T   (contract co) — exact f32 via bf16x3 is overkill for
        # a 3-wide output but keeps all cotangents at the same fidelity
        d_s = d_ref[:, pl.ds(off, co)]
        drf_acc = drf_acc + mm(du, d_s, ((1,), (1,)))
        # dW_s = g^T @ dpi    (contract rows)
        dw_ref[:, pl.ds(off, co)] += mm(g, dpi, ((0,), (0,)))
        db_ref[0:1, pl.ds(off, co)] += jnp.sum(dpi, axis=0, keepdims=True)
        # dd_s = rf^T @ du    (contract rows)
        dd_ref[0:3, pl.ds(off, co)] += mm(rf, du, ((0,), (0,)))
        return dg_acc, drf_acc

    dg_acc, drf_acc = jax.lax.fori_loop(
        0, s, body, (jnp.zeros((rows, cin), jnp.float32),
                     jnp.zeros((rows, 3), jnp.float32)))
    dg_ref[0] = dg_acc.reshape(kp, tq, cin)
    drf_ref[0] = drf_acc.reshape(kp, tq, 3)


def _support_bwd_vals_kernel(g_ref, rf_ref, w_ref, d_ref, win_ref, twin_ref,
                             pwin_ref, gbar_ref, dg_ref, drf_ref, dw_ref,
                             db_ref, dd_ref, *, s: int, co: int, k_valid: int,
                             exact: bool):
    """Backward with forward-stored winner values (probe (c)).

    The standard backward (:_support_bwd_kernel) recomputes proj and theta per
    support — one big (rows, Cin)x(Cin, Co) MXU pass each iteration.  Here the
    forward stored the winner's theta/proj values, so per support only the
    cotangent matmuls remain (dg, dW, drf, dd); the cotangent tensors are
    built by broadcasting the (TQ, Co) winner values through the one-hot
    winner selection.  Numerics identical to the recompute path (same winner,
    same values — the forward computed them).
    """
    kp, tq, cin = g_ref.shape[1], g_ref.shape[2], g_ref.shape[3]
    rows = kp * tq
    g = g_ref[0].reshape(rows, cin).astype(jnp.float32)
    rf = rf_ref[0].reshape(rows, 3).astype(jnp.float32)
    gb = gbar_ref[0] / s  # (tq, co)

    is_first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(is_first)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dd_ref[:] = jnp.zeros_like(dd_ref)

    dflt = jax.lax.Precision.DEFAULT

    def mm(a, b, dims):
        if not exact:
            return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=dflt)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(a_hi, b_hi, dimension_numbers=(dims, ((), ())),
                                  preferred_element_type=jnp.float32, precision=dflt)
        out += jax.lax.dot_general(a_hi, b_lo, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32, precision=dflt)
        out += jax.lax.dot_general(a_lo, b_hi, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32, precision=dflt)
        return out

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (kp, tq, co), 0)

    def body(j, carry):
        dg_acc, drf_acc = carry
        off = pl.multiple_of(j * co, co)
        w_s = w_ref[:, pl.ds(off, co)]
        d_s = d_ref[:, pl.ds(off, co)]
        ik = win_ref[0, :, pl.ds(off, co)]  # (tq, co)
        tw = twin_ref[0, :, pl.ds(off, co)]
        pw = pwin_ref[0, :, pl.ds(off, co)]
        sel = (k_iota == ik[None]).astype(jnp.float32)  # one-hot over k
        dpi = (sel * (gb * tw)[None]).reshape(rows, co)
        du = (sel * jnp.where(tw > 0, gb * pw, 0.0)[None]).reshape(rows, co)
        dg_acc = dg_acc + mm(dpi, w_s, ((1,), (1,)))
        drf_acc = drf_acc + mm(du, d_s, ((1,), (1,)))
        dw_ref[:, pl.ds(off, co)] += mm(g, dpi, ((0,), (0,)))
        db_ref[0:1, pl.ds(off, co)] += jnp.sum(dpi, axis=0, keepdims=True)
        dd_ref[0:3, pl.ds(off, co)] += mm(rf, du, ((0,), (0,)))
        return dg_acc, drf_acc

    dg_acc, drf_acc = jax.lax.fori_loop(
        0, s, body, (jnp.zeros((rows, cin), jnp.float32),
                     jnp.zeros((rows, 3), jnp.float32)))
    dg_ref[0] = dg_acc.reshape(kp, tq, cin)
    drf_ref[0] = drf_acc.reshape(kp, tq, 3)


def _surface_bwd_kernel(rf_ref, d_ref, win_ref, gbar_ref, drf_ref, dd_ref, *,
                        s: int, co: int, k_valid: int, exact: bool):
    """Backward of the theta-only reduction: cotangents for rf and dirs.
    Winner-k comes from the forward's ``win`` residual (see _support_bwd)."""
    kp, tq = rf_ref.shape[1], rf_ref.shape[2]
    rows = kp * tq
    rf = rf_ref[0].reshape(rows, 3).astype(jnp.float32)
    gb = gbar_ref[0] / s

    is_first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(is_first)
    def _():
        dd_ref[:] = jnp.zeros_like(dd_ref)

    dflt = jax.lax.Precision.DEFAULT
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (kp, tq, co), 0)

    def body(j, drf_acc):
        off = pl.multiple_of(j * co, co)
        theta = _theta(rf, d_ref, off, co, exact=exact, mxu=not exact)
        ik = win_ref[0, :, pl.ds(off, co)]
        sel = (k_iota == ik[None]).astype(jnp.float32)
        du = jnp.where(theta > 0, (sel * gb[None]).reshape(rows, co), 0.0)
        d_s = d_ref[:, pl.ds(off, co)]
        drf_acc = drf_acc + jax.lax.dot_general(
            du, d_s, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dflt)
        dd_ref[0:3, pl.ds(off, co)] += jax.lax.dot_general(
            rf, du, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dflt)
        return drf_acc

    drf_acc = jax.lax.fori_loop(0, s, body, jnp.zeros((rows, 3), jnp.float32))
    drf_ref[0] = drf_acc.reshape(kp, tq, 3)


def _prep_kmajor(x, tq):
    """(B, K, N, C): pad K to the sublane multiple and N to the tile multiple."""
    B, K, N, C = x.shape
    k_pad = ((K + _K_ALIGN - 1) // _K_ALIGN) * _K_ALIGN
    n_pad = ((N + tq - 1) // tq) * tq
    return _pad_axis(_pad_axis(x, k_pad, 1), n_pad, 2), k_pad, n_pad


def _support_pallas(g, rf, w, b2, d, *, s, co, k_valid, tq, exact, interpret,
                    theta_mxu=True, want_win=False, want_vals=False):
    """Forward pallas_call on padded k-major inputs -> (B, n_pad, Co)
    [+ win (B, n_pad, S·Co) i32 when want_win, + twin/pwin f32 when
    want_vals]."""
    B, k_pad, n_pad, cin = g.shape
    s_co = s * co
    out_shape = [jax.ShapeDtypeStruct((B, n_pad, co), jnp.float32)]
    out_specs = [pl.BlockSpec((1, tq, co), lambda i, j: (i, j, 0))]
    if want_win:
        out_shape.append(jax.ShapeDtypeStruct((B, n_pad, s_co), jnp.int32))
        out_specs.append(pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)))
    if want_vals:
        for _ in range(2):  # twin, pwin
            out_shape.append(jax.ShapeDtypeStruct((B, n_pad, s_co), jnp.float32))
            out_specs.append(pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)))
    return pl.pallas_call(
        functools.partial(_support_kernel, s=s, co=co, k_valid=k_valid,
                          exact=exact, theta_mxu=theta_mxu, want_win=want_win,
                          want_vals=want_vals),
        out_shape=tuple(out_shape) if want_win else out_shape[0],
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, k_pad, tq, cin), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, k_pad, tq, 3), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((cin, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((3, s_co), lambda i, j: (0, 0)),
        ],
        out_specs=tuple(out_specs) if want_win else out_specs[0],
        interpret=interpret,
    )(g, rf, w, b2, d)


def _support_pallas_bwd(g, rf, w, b2, d, win, gbar, *, s, co, k_valid, tq,
                        exact, interpret):
    """Backward pallas_call -> (dg, drf, dw, db2, dd) on padded shapes."""
    B, k_pad, n_pad, cin = g.shape
    s_co = s * co
    tq = _pick_tq_bwd(tq, n_pad, k_pad, cin, co, s_co)  # bwd holds more VMEM/row
    dg, drf, dw, db, dd = pl.pallas_call(
        functools.partial(_support_bwd_kernel, s=s, co=co, k_valid=k_valid,
                          exact=exact),
        out_shape=(
            jax.ShapeDtypeStruct((B, k_pad, n_pad, cin), jnp.float32),
            jax.ShapeDtypeStruct((B, k_pad, n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((cin, s_co), jnp.float32),
            jax.ShapeDtypeStruct((8, s_co), jnp.float32),
            jax.ShapeDtypeStruct((8, s_co), jnp.float32),
        ),
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, k_pad, tq, cin), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, k_pad, tq, 3), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((cin, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((3, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tq, co), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, k_pad, tq, cin), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, k_pad, tq, 3), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((cin, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((8, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((8, s_co), lambda i, j: (0, 0)),
        ),
        interpret=interpret,
    )(g, rf, w, b2, d, win, gbar)
    return dg, drf, dw, db[0:1], dd[0:3]


def _support_pallas_bwd_vals(g, rf, w, d, win, twin, pwin, gbar, *, s, co,
                             k_valid, tq, exact, interpret):
    """Backward pallas_call for the stored-winner-values variant."""
    B, k_pad, n_pad, cin = g.shape
    s_co = s * co
    tq = _pick_tq_bwd(tq, n_pad, k_pad, cin, co, s_co)
    dg, drf, dw, db, dd = pl.pallas_call(
        functools.partial(_support_bwd_vals_kernel, s=s, co=co,
                          k_valid=k_valid, exact=exact),
        out_shape=(
            jax.ShapeDtypeStruct((B, k_pad, n_pad, cin), jnp.float32),
            jax.ShapeDtypeStruct((B, k_pad, n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((cin, s_co), jnp.float32),
            jax.ShapeDtypeStruct((8, s_co), jnp.float32),
            jax.ShapeDtypeStruct((8, s_co), jnp.float32),
        ),
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, k_pad, tq, cin), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, k_pad, tq, 3), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((cin, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((3, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tq, co), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, k_pad, tq, cin), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, k_pad, tq, 3), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((cin, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((8, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((8, s_co), lambda i, j: (0, 0)),
        ),
        interpret=interpret,
    )(g, rf, w, d, win, twin, pwin, gbar)
    return dg, drf, dw, db[0:1], dd[0:3]


@functools.lru_cache(maxsize=None)
def _support_diff_fn(s, co, k_valid, tq, exact, interpret, theta_mxu=True,
                     bwd_exact=None, bwd_store=False):
    """custom_vjp-wrapped support reduction over padded k-major tensors.

    ``bwd_exact`` decouples backward precision from the forward: gradients feed
    an optimizer that tolerates bf16-grade noise, so training runs the backward
    at one MXU pass per matmul (3x fewer than bf16x3) while the forward stays
    f32-faithful — the measured win is ~2/3 of the backward-kernel time
    (docs/PERFORMANCE.md).

    ``bwd_store``: the forward additionally stores the winner's theta/proj
    values and the backward skips both recomputes — one fewer big MXU pass
    per support, paid for with 2 (B, N, S·Co) f32 residuals (probe (c))."""
    if bwd_exact is None:
        bwd_exact = exact

    @jax.custom_vjp
    def fn(g, rf, w, b2, d):
        return _support_pallas(g, rf, w, b2, d, s=s, co=co, k_valid=k_valid,
                               tq=tq, exact=exact, interpret=interpret,
                               theta_mxu=theta_mxu)

    def fwd(g, rf, w, b2, d):
        if bwd_store:
            out, win, twin, pwin = _support_pallas(
                g, rf, w, b2, d, s=s, co=co, k_valid=k_valid, tq=tq,
                exact=exact, interpret=interpret, theta_mxu=theta_mxu,
                want_win=True, want_vals=True)
            return out, (g, rf, w, b2, d, win, twin, pwin)
        out, win = _support_pallas(g, rf, w, b2, d, s=s, co=co,
                                   k_valid=k_valid, tq=tq, exact=exact,
                                   interpret=interpret, theta_mxu=theta_mxu,
                                   want_win=True)
        return out, (g, rf, w, b2, d, win, None, None)

    def bwd(res, gbar):
        g, rf, w, b2, d, win, twin, pwin = res
        if bwd_store:
            dg, drf, dw, db2, dd = _support_pallas_bwd_vals(
                g, rf, w, d, win, twin, pwin, gbar, s=s, co=co,
                k_valid=k_valid, tq=tq, exact=bwd_exact, interpret=interpret)
        else:
            dg, drf, dw, db2, dd = _support_pallas_bwd(
                g, rf, w, b2, d, win, gbar, s=s, co=co, k_valid=k_valid, tq=tq,
                exact=bwd_exact, interpret=interpret)
        return (dg.astype(g.dtype), drf.astype(rf.dtype), dw.astype(w.dtype),
                db2.astype(b2.dtype), dd.astype(d.dtype))

    fn.defvjp(fwd, bwd)
    return fn


@functools.partial(jax.jit, static_argnames=("support_num", "out_channel", "tq",
                                             "exact", "interpret", "kmajor",
                                             "theta_mxu", "bwd_exact",
                                             "bwd_store"))
def hs_support_reduce(gathered: jnp.ndarray, rf_norm: jnp.ndarray,
                      weights: jnp.ndarray, bias: jnp.ndarray, dirs: jnp.ndarray,
                      support_num: int, out_channel: int, tq: int = 0,
                      exact: bool = True, interpret: bool = False,
                      kmajor: bool = False,
                      theta_mxu: bool | None = None,
                      bwd_exact: bool | None = None,
                      bwd_store: bool = False) -> jnp.ndarray:
    """``mean_s max_k relu(rf·dir_s)·(gathered @ W_s + b_s)`` per point.

    gathered (B, N, K, Cin), rf_norm (B, N, K, 3) — or (B, K, N, ·) when
    ``kmajor=True`` (preferred: the caller's gather can emit that layout for free,
    the (B,N,K,C) form costs an HBM-round-trip transpose here).
    weights (Cin, S·Co), bias (S·Co,), dirs (3, S·Co) -> (B, N, Co) f32.

    Fully differentiable: a custom VJP pairs the forward with a fused backward
    kernel emitting cotangents for all five tensor inputs (the reference trains
    this op end-to-end, gcn3d.py:92-187).
    """
    if theta_mxu is None:
        theta_mxu = not exact  # measured: VPU theta wins for exact, MXU for fast
    if tq <= 0:
        tq = 128
    if not kmajor:
        gathered = _to_kmajor(gathered)
        rf_norm = _to_kmajor(rf_norm)
    B, K, N, Cin = gathered.shape
    s_co = support_num * out_channel
    k_pad = ((K + _K_ALIGN - 1) // _K_ALIGN) * _K_ALIGN
    # bwd_store's twin/pwin residual blocks live in VMEM too (f32, (tq, s_co)
    # each) alongside the win block (i32), all double-buffered by Mosaic.
    # Only the EXACT forward overflows with them (bf16 splits + bf16x3
    # temporaries push it over the 16 MB scoped limit by 1.6 MB at conv_1's
    # tq=128; measured) — shrink its tile to 112.  The bf16 forward fits at
    # 128, and shrinking it costs the whole bwd_store win (measured: -3.8%
    # at tq=128 vs -0.2% at tq=112), so it keeps the unshrunk pick.
    tq = _pick_tq(tq, k_pad, Cin, out_channel, s_co,
                  extra_q_bytes=s_co * 28 if (bwd_store and exact) else 0)
    g, k_pad, n_pad = _prep_kmajor(gathered, tq)
    rf, _, _ = _prep_kmajor(rf_norm, tq)
    fn = _support_diff_fn(support_num, out_channel, K, tq, exact, interpret,
                          theta_mxu, bwd_exact, bwd_store)
    out = fn(g, rf, weights, bias.reshape(1, -1), dirs)
    return out[:, :N]


def _surface_pallas(rf, d, *, s, co, k_valid, tq, exact, interpret,
                    theta_mxu=True, want_win=False):
    B, k_pad, n_pad, _ = rf.shape
    s_co = s * co
    out_shape = [jax.ShapeDtypeStruct((B, n_pad, co), jnp.float32)]
    out_specs = [pl.BlockSpec((1, tq, co), lambda i, j: (i, j, 0))]
    if want_win:
        out_shape.append(jax.ShapeDtypeStruct((B, n_pad, s_co), jnp.int32))
        out_specs.append(pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)))
    return pl.pallas_call(
        functools.partial(_surface_kernel, s=s, co=co, k_valid=k_valid,
                          exact=exact, theta_mxu=theta_mxu, want_win=want_win),
        out_shape=tuple(out_shape) if want_win else out_shape[0],
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, k_pad, tq, 3), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((3, s_co), lambda i, j: (0, 0)),
        ],
        out_specs=tuple(out_specs) if want_win else out_specs[0],
        interpret=interpret,
    )(rf, d)


@functools.lru_cache(maxsize=None)
def _surface_diff_fn(s, co, k_valid, tq, exact, interpret, theta_mxu=True,
                     bwd_exact=None):
    if bwd_exact is None:
        bwd_exact = exact

    @jax.custom_vjp
    def fn(rf, d):
        return _surface_pallas(rf, d, s=s, co=co, k_valid=k_valid, tq=tq,
                               exact=exact, interpret=interpret,
                               theta_mxu=theta_mxu)

    def fwd(rf, d):
        out, win = _surface_pallas(rf, d, s=s, co=co, k_valid=k_valid, tq=tq,
                                   exact=exact, interpret=interpret,
                                   theta_mxu=theta_mxu, want_win=True)
        return out, (rf, d, win)

    def bwd(res, gbar):
        rf, d, win = res
        B, k_pad, n_pad, _ = rf.shape
        s_co = s * co
        drf, dd = pl.pallas_call(
            functools.partial(_surface_bwd_kernel, s=s, co=co, k_valid=k_valid,
                              exact=bwd_exact),
            out_shape=(
                jax.ShapeDtypeStruct((B, k_pad, n_pad, 3), jnp.float32),
                jax.ShapeDtypeStruct((8, s_co), jnp.float32),
            ),
            grid=(B, n_pad // tq),
            in_specs=[
                pl.BlockSpec((1, k_pad, tq, 3), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((3, s_co), lambda i, j: (0, 0)),
                pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, tq, co), lambda i, j: (i, j, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, k_pad, tq, 3), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((8, s_co), lambda i, j: (0, 0)),
            ),
            interpret=interpret,
        )(rf, d, win, gbar)
        return drf.astype(rf.dtype), dd[0:3].astype(d.dtype)

    fn.defvjp(fwd, bwd)
    return fn


@functools.partial(jax.jit, static_argnames=("support_num", "out_channel", "tq",
                                             "exact", "interpret", "kmajor",
                                             "theta_mxu", "bwd_exact"))
def hs_surface_reduce(rf_norm: jnp.ndarray, dirs: jnp.ndarray, support_num: int,
                      out_channel: int, tq: int = 0, exact: bool = True,
                      interpret: bool = False, kmajor: bool = False,
                      theta_mxu: bool | None = None,
                      bwd_exact: bool | None = None) -> jnp.ndarray:
    """rf_norm (B, N, K, 3) (or (B, K, N, 3) with ``kmajor=True``),
    dirs (3, S·C) -> (B, N, C) theta-only reduction.

    Differentiable via a custom VJP (cotangents for both rf and dirs)."""
    if theta_mxu is None:
        theta_mxu = not exact
    if tq <= 0:
        tq = 64 if exact else 128
    if not kmajor:
        rf_norm = _to_kmajor(rf_norm)
    B, K, N, _ = rf_norm.shape
    s_co = support_num * out_channel
    k_pad = ((K + _K_ALIGN - 1) // _K_ALIGN) * _K_ALIGN
    tq = _pick_tq(tq, k_pad, 0, out_channel, s_co)
    rf, k_pad, n_pad = _prep_kmajor(rf_norm, tq)
    fn = _surface_diff_fn(support_num, out_channel, K, tq, exact, interpret,
                          theta_mxu, bwd_exact)
    out = fn(rf, dirs)
    return out[:, :N]

"""Fully-fused HS kernels: in-kernel gather + rf + support reduction (v4).

The v3 kernels (``pallas_hs.py``) consume pre-gathered k-major tensors; the XLA
side then pays for the one-hot gather einsums, the (B,K,N,3) rf chain (whose
3-wide minor dim is lane-padded ~43x in HBM layout — pads/divides alone cost
~17 ms of the 224 ms bf16 forward), and the K/N padding copies.  Here ONE
program does everything for its query tile:

* the per-batch ``[features | xyz]`` blocks stay resident in VMEM across the
  query-tile grid axis (index map pins them, Mosaic fetches them once per
  batch);
* per real neighbour slot k (no K padding — padded slots never existed), a
  one-hot row matrix gathers features+xyz in MXU passes, the receptive-field
  direction is formed and normalized in-register, and theta/projection run for
  all supports at once as (TQ, S·Co) matmuls;
* a running max over k and a static per-support mean produce the output tile —
  nothing but the (TQ, Co) result ever touches HBM.

Precision (v4.1): ``exact=False`` is the bf16 fast-inference path — inputs cast
to bf16, one DEFAULT MXU pass per matmul (one-hot entries are exact in bf16 and
the MXU accumulates in f32, so the *gather itself* is exact for bf16 values).
``exact=True`` is f32-faithful: features ship as a 3-term bf16 split
(hi+lo+lo2 reconstructs f32 to ~1 ulp), xyz as a 2-term split, projections run
as manual bf16x3 (``Precision.HIGH`` does not exist inside Mosaic) and theta
on the VPU in f32 (overlapping the gather/proj MXU passes) — rel. error ~1e-7
on proj and ~1.5e-5 via the xyz split on theta, far inside the v3 exact
kernels' parity budget.

Differentiability (v4.2): all three reductions carry a ``jax.custom_vjp``.
The forward-for-grad variant additionally records the winning neighbour slot
per (point, channel) (strict-``>`` running max == first-occurrence argmax, the
same tie-break as the v3 kernels); the fused backward kernel re-gathers and
re-projects per slot, selects by the recorded winner, and emits every
cotangent — the neighbour-gather backward is a one-hot *transpose* matmul
(``onehot^T @ dg``), i.e. an MXU scatter accumulated in VMEM, so no
(B,K,N,C) tensor exists in either direction.  Training runs these kernels
end-to-end like the reference trains its hot loop (``gcn3d.py:39-47,92-187``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_NEG_BIG = -3.4e38
_DFLT = jax.lax.Precision.DEFAULT
_EPS = 1e-12


# ---------------------------------------------------------------------------
# XLA-side helpers
# ---------------------------------------------------------------------------

def _pad_axis(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _split_bf16(x, terms: int):
    """Split an f32 array into ``terms`` bf16 arrays summing to ~x (1 ulp for 3)."""
    parts = []
    rest = x.astype(jnp.float32)
    for _ in range(terms - 1):
        hi = rest.astype(jnp.bfloat16)
        parts.append(hi)
        rest = rest - hi.astype(jnp.float32)
    parts.append(rest.astype(jnp.bfloat16))
    return parts


def _feat_parts(x, exact):
    """Feature operand splits per serving tier.

    ``exact`` is False (fast bf16: one part), True (f32-faithful: 3-term split,
    0-ULP one-hot gathers), or the string ``"f32x2"`` (2-term split: gathers
    reconstruct features to ~1.5e-5 relative — 16 mantissa bits — while
    dropping one MXU pass from every feature gather, the dominant split-gather
    cost of the exact tier).  Downstream matmuls are already ~1e-5-grade in
    exact mode (2-term weight splits), so f32x2 degrades the tier's end-to-end
    error only marginally; mAP-level parity evidence in
    scripts/fast_mode_parity.py.
    """
    return _split_bf16(x, _n_feat_parts(exact)) if exact \
        else [x.astype(jnp.bfloat16)]


def _n_feat_parts(exact):
    if not exact:
        return 1
    return 2 if exact == "f32x2" else 3


def _xyz_parts(x, exact: bool):
    return _split_bf16(x, 2) if exact else [x.astype(jnp.bfloat16)]


def _w_parts(x, exact: bool):
    return _split_bf16(x, 2) if exact else [x.astype(jnp.bfloat16)]


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _gather(onehot, parts):
    """onehot (tq, n) bf16 one-hot rows x split source blocks -> exact f32 rows."""
    acc = None
    for p in parts:
        t = jnp.dot(onehot, p, preferred_element_type=jnp.float32,
                    precision=_DFLT)
        acc = t if acc is None else acc + t
    return acc


def _mm(a, w_parts, exact: bool):
    """a (rows, ca) f32 x split weight (ca, cb) -> f32; bf16x3 when exact."""
    if not exact:
        return jnp.dot(a.astype(jnp.bfloat16), w_parts[0],
                       preferred_element_type=jnp.float32, precision=_DFLT)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(a_hi, w_parts[0], preferred_element_type=jnp.float32, precision=_DFLT)
            + jnp.dot(a_hi, w_parts[1], preferred_element_type=jnp.float32, precision=_DFLT)
            + jnp.dot(a_lo, w_parts[0], preferred_element_type=jnp.float32, precision=_DFLT))


def _mm_g(a, b, dims, exact: bool):
    """General dot_general with bf16x3 (exact) or one bf16 pass (fast)."""

    def dg(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_DFLT)

    if not exact:
        return dg(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return dg(a_hi, b_hi) + dg(a_hi, b_lo) + dg(a_lo, b_hi)


def _mm_gp(a, parts, dims, exact: bool):
    """dot_general of f32 ``a`` against an already-split operand (sum of
    ``parts``): bf16x3-grade without materializing the f32 sum in VMEM."""

    def dg(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_DFLT)

    if not exact:
        return dg(a.astype(jnp.bfloat16), parts[0])
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return dg(a_hi, parts[0]) + dg(a_hi, parts[1]) + dg(a_lo, parts[0])


def _scatter_rows(onehot, dg, exact: bool):
    """onehot^T @ dg: (n, tq) x (tq, c) MXU scatter of per-row cotangents."""
    if not exact:
        return jax.lax.dot_general(
            onehot, dg.astype(jnp.bfloat16),
            dimension_numbers=((((0,), (0,))), ((), ())),
            preferred_element_type=jnp.float32, precision=_DFLT)
    dg_hi = dg.astype(jnp.bfloat16)
    dg_lo = (dg - dg_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(onehot, dg_hi,
                              dimension_numbers=((((0,), (0,))), ((), ())),
                              preferred_element_type=jnp.float32, precision=_DFLT)
    return out + jax.lax.dot_general(onehot, dg_lo,
                                     dimension_numbers=((((0,), (0,))), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=_DFLT)



def _theta_relu(rfn, d_parts, exact: bool):
    """relu(rfn·dir): VPU in exact mode (f32, overlaps the gather/proj MXU
    passes — a bf16x3 theta costs as many MXU passes as the projection);
    one bf16 MXU pass in fast mode."""
    if not exact:
        return jax.nn.relu(jnp.dot(rfn.astype(jnp.bfloat16), d_parts[0],
                                   preferred_element_type=jnp.float32,
                                   precision=_DFLT))
    d = sum(p.astype(jnp.float32) for p in d_parts)
    return jax.nn.relu(rfn[:, 0:1] * d[0:1] + rfn[:, 1:2] * d[1:2]
                       + rfn[:, 2:3] * d[2:3])

def _rf_chain(gxyz, cv):
    """rf = gathered xyz - centre; unit-normalized with the XLA-matching clamp
    (ops/knn.neighbor_directions_normalized: direction / max(norm, 1e-12))."""
    rf = gxyz - cv
    norm = jnp.sqrt(jnp.sum(rf * rf, axis=1, keepdims=True))
    inv = 1.0 / jnp.maximum(norm, _EPS)
    return rf, norm, inv, rf * inv


def _rf_chain_bwd(rf, norm, inv, drfn):
    """Cotangent of rf from rfn = rf * inv (inv = 1/max(norm, eps))."""
    s_dot = jnp.sum(drfn * rf, axis=1, keepdims=True)
    live = (norm >= _EPS).astype(jnp.float32)
    return drfn * inv - rf * (s_dot * inv * inv * inv) * live


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _support_fwd_kernel(*refs, s: int, co: int, k: int, nf: int, nv: int,
                        nw: int, nd: int, exact: bool, want_win: bool,
                        slots: int = 2):
    """Inputs: feat parts (nf) (1,n,cin) | verts parts (nv) (1,n,3) |
    vt parts (nv) (1,tq,3) | idx (1,tq,k_pad) | w parts (nw) (cin,S·Co) |
    b (1,S·Co) | d parts (nd) (3,S·Co).
    Outputs: out (1,tq,co) [+ win (1,tq,S·Co) i32].

    The query centre is reconstructed from the SAME bf16 splits as the source
    block, so a self-neighbour's rf is exactly zero — a mixed representation
    would normalize the rounding residual into a bogus unit direction."""
    it = iter(refs)
    f_parts = [next(it)[0] for _ in range(nf)]
    v_parts = [next(it)[0] for _ in range(nv)]
    vt_parts = [next(it)[0] for _ in range(nv)]
    idx_ref = next(it)
    w_parts = [next(it)[...] for _ in range(nw)]
    b_ref = next(it)
    d_parts = [next(it)[...] for _ in range(nd)]
    o_ref = next(it)
    win_ref = next(it) if want_win else None

    n_pad = f_parts[0].shape[0]
    tq = vt_parts[0].shape[0]
    cv = sum(p.astype(jnp.float32) for p in vt_parts)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n_pad), 1)

    macc = jnp.full((tq, s * co), _NEG_BIG, jnp.float32)
    win = jnp.zeros((tq, s * co), jnp.int32) if want_win else None
    if want_win or k < 2:
        for j in range(k):
            idx_j = idx_ref[0, :, j:j + 1]
            onehot = (iota_n == idx_j).astype(jnp.bfloat16)
            g = _gather(onehot, f_parts)
            gxyz = _gather(onehot, v_parts)
            _, _, _, rfn = _rf_chain(gxyz, cv)
            proj = _mm(g, w_parts, exact) + b_ref[0:1]
            theta = _theta_relu(rfn, d_parts, exact)
            prod = theta * proj
            if want_win:
                upd = prod > macc
                win = jnp.where(upd, j, win)
                macc = jnp.where(upd, prod, macc)
            else:
                macc = jnp.maximum(macc, prod)
    else:
        # serving path: process neighbour slots in GROUPS of ``slots`` — one
        # (g·tq, n) one-hot matmul per gather/projection instead of g (tq, n)
        # ones.  Same FLOPs, 1/g the MXU passes, and the resident source block
        # streams through the MXU weight registers 1/g as often (the kernels
        # are pass-bound, not FLOP-bound — docs/PERFORMANCE.md N-scaling probe)
        gmax = max(1, min(slots, k))
        for j0 in range(0, k, gmax):
            gg = min(gmax, k - j0)
            # concat the aligned (tq, n) one-hots, not the idx column slices
            # (Mosaic can't concat vectors with mismatched lane offsets)
            ohs = [iota_n == idx_ref[0, :, j0 + t:j0 + t + 1]
                   for t in range(gg)]
            onehot = (ohs[0] if gg == 1 else
                      jnp.concatenate(ohs, axis=0)).astype(jnp.bfloat16)
            cvg = cv if gg == 1 else jnp.concatenate([cv] * gg, axis=0)
            g = _gather(onehot, f_parts)
            gxyz = _gather(onehot, v_parts)
            _, _, _, rfn = _rf_chain(gxyz, cvg)
            proj = _mm(g, w_parts, exact) + b_ref[0:1]
            theta = _theta_relu(rfn, d_parts, exact)
            prod = theta * proj
            m = prod[:tq]
            for t in range(1, gg):
                m = jnp.maximum(m, prod[t * tq:(t + 1) * tq])
            macc = jnp.maximum(macc, m)

    acc = jnp.zeros((tq, co), jnp.float32)
    for j in range(s):
        acc = acc + macc[:, j * co:(j + 1) * co]
    o_ref[0] = acc / s
    if want_win:
        win_ref[0] = win


def _surface_fwd_kernel(*refs, s: int, co: int, k: int, nv: int, nd: int,
                        exact: bool, want_win: bool, slots: int = 2):
    """verts parts (nv) (1,n,3) | vt (1,tq,3) | idx | d parts (nd) ->
    out (1,tq,co) [+ win]: theta-only reduction."""
    it = iter(refs)
    v_parts = [next(it)[0] for _ in range(nv)]
    vt_parts = [next(it)[0] for _ in range(nv)]
    idx_ref = next(it)
    d_parts = [next(it)[...] for _ in range(nd)]
    o_ref = next(it)
    win_ref = next(it) if want_win else None

    n_pad = v_parts[0].shape[0]
    tq = vt_parts[0].shape[0]
    cv = sum(p.astype(jnp.float32) for p in vt_parts)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n_pad), 1)

    macc = jnp.full((tq, s * co), _NEG_BIG, jnp.float32)
    win = jnp.zeros((tq, s * co), jnp.int32) if want_win else None
    if want_win or k < 2:
        for j in range(k):
            idx_j = idx_ref[0, :, j:j + 1]
            onehot = (iota_n == idx_j).astype(jnp.bfloat16)
            gxyz = _gather(onehot, v_parts)
            _, _, _, rfn = _rf_chain(gxyz, cv)
            theta = _theta_relu(rfn, d_parts, exact)
            if want_win:
                upd = theta > macc
                win = jnp.where(upd, j, win)
                macc = jnp.where(upd, theta, macc)
            else:
                macc = jnp.maximum(macc, theta)
    else:
        # serving path: grouped slots, 1/slots the MXU pass count (see the
        # support kernel's comment)
        gmax = max(1, min(slots, k))
        for j0 in range(0, k, gmax):
            gg = min(gmax, k - j0)
            ohs = [iota_n == idx_ref[0, :, j0 + t:j0 + t + 1]
                   for t in range(gg)]
            onehot = (ohs[0] if gg == 1 else
                      jnp.concatenate(ohs, axis=0)).astype(jnp.bfloat16)
            cvg = cv if gg == 1 else jnp.concatenate([cv] * gg, axis=0)
            gxyz = _gather(onehot, v_parts)
            _, _, _, rfn = _rf_chain(gxyz, cvg)
            theta = _theta_relu(rfn, d_parts, exact)
            m = theta[:tq]
            for t in range(1, gg):
                m = jnp.maximum(m, theta[t * tq:(t + 1) * tq])
            macc = jnp.maximum(macc, m)

    acc = jnp.zeros((tq, co), jnp.float32)
    for j in range(s):
        acc = acc + macc[:, j * co:(j + 1) * co]
    o_ref[0] = acc / s
    if want_win:
        win_ref[0] = win


def _orl_fwd_kernel(*refs, k: int, n_valid: int, tq: int, want_win: bool,
                    slots: int = 2):
    """Fused outlier-robust-global reduction: per point, max of its KNN rows,
    summed over the tile into a per-batch (1, C) accumulator (mean finished by
    the caller).  feat parts (1, n_pad, C) resident; idx (1, tq, k_pad);
    out (1, 8, C) accumulated across the tile grid axis [+ win (1, tq, C)]."""
    it = iter(refs)
    nf = len(refs) - (3 if want_win else 2)
    f_parts = [next(it)[0] for _ in range(nf)]
    idx_ref = next(it)
    o_ref = next(it)
    win_ref = next(it) if want_win else None

    n_pad = f_parts[0].shape[0]
    c = f_parts[0].shape[1]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n_pad), 1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    macc = jnp.full((tq, c), _NEG_BIG, jnp.float32)
    win = jnp.zeros((tq, c), jnp.int32) if want_win else None
    if want_win or k < 2:
        for j in range(k):
            idx_j = idx_ref[0, :, j:j + 1]
            onehot = (iota_n == idx_j).astype(jnp.bfloat16)
            gk = _gather(onehot, f_parts)
            if want_win:
                upd = gk > macc
                win = jnp.where(upd, j, win)
                macc = jnp.where(upd, gk, macc)
            else:
                macc = jnp.maximum(macc, gk)
    else:
        # serving path: grouped slots, 1/slots the MXU pass count (see the
        # support kernel's comment)
        gmax = max(1, min(slots, k))
        for j0 in range(0, k, gmax):
            gg = min(gmax, k - j0)
            ohs = [iota_n == idx_ref[0, :, j0 + t:j0 + t + 1]
                   for t in range(gg)]
            onehot = (ohs[0] if gg == 1 else
                      jnp.concatenate(ohs, axis=0)).astype(jnp.bfloat16)
            gk = _gather(onehot, f_parts)
            m = gk[:tq]
            for t in range(1, gg):
                m = jnp.maximum(m, gk[t * tq:(t + 1) * tq])
            macc = jnp.maximum(macc, m)

    # padded query rows gathered row 0's features — zero them before the sum
    row = pl.program_id(1) * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    o_ref[0, 0:1, :] += jnp.sum(jnp.where(row < n_valid, macc, 0.0), axis=0,
                                keepdims=True)
    if want_win:
        win_ref[0] = win


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _support_bwd_kernel(*refs, s: int, co: int, k: int, nf: int, nv: int,
                        nw: int, nd: int, exact: bool):
    """Inputs: feat parts | verts parts | vt | idx | w parts | b | d parts |
    win (1,tq,S·Co) | gbar (1,tq,co).
    Outputs: dfeat (1,n,cin) [tile-accumulated] | dvsrc (1,n,3) [accumulated] |
    dvq (1,tq,3) | dw (cin,S·Co) | db (8,S·Co) | dd (8,S·Co) [grid-accumulated].
    """
    it = iter(refs)
    f_parts = [next(it)[0] for _ in range(nf)]
    v_parts = [next(it)[0] for _ in range(nv)]
    vt_parts = [next(it)[0] for _ in range(nv)]
    idx_ref = next(it)
    w_parts = [next(it)[...] for _ in range(nw)]
    b_ref = next(it)
    d_parts = [next(it)[...] for _ in range(nd)]
    win_ref = next(it)
    gbar_ref = next(it)
    dfeat_ref = next(it)
    dvsrc_ref = next(it)
    dvq_ref = next(it)
    dw_ref = next(it)
    db_ref = next(it)
    dd_ref = next(it)

    n_pad = f_parts[0].shape[0]
    tq = vt_parts[0].shape[0]
    cv = sum(p.astype(jnp.float32) for p in vt_parts)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n_pad), 1)
    win = win_ref[0]
    gb = gbar_ref[0] / s  # (tq, co)
    gb_rep = jnp.concatenate([gb] * s, axis=1)  # (tq, S·Co)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)
        dvsrc_ref[...] = jnp.zeros_like(dvsrc_ref)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dd_ref[...] = jnp.zeros_like(dd_ref)

    dcv = jnp.zeros((tq, 3), jnp.float32)
    for j in range(k):
        idx_j = idx_ref[0, :, j:j + 1]
        onehot = (iota_n == idx_j).astype(jnp.bfloat16)
        g = _gather(onehot, f_parts)
        gxyz = _gather(onehot, v_parts)
        rf, norm, inv, rfn = _rf_chain(gxyz, cv)
        proj = _mm(g, w_parts, exact) + b_ref[0:1]
        theta = _theta_relu(rfn, d_parts, exact)

        sel = (win == j).astype(jnp.float32)
        dprod = sel * gb_rep
        dproj = dprod * theta
        dz = jnp.where(theta > 0, dprod * proj, 0.0)

        dw_ref[...] += _mm_g(g, dproj, ((0,), (0,)), exact)  # (cin, S·Co)
        db_ref[0:1] += jnp.sum(dproj, axis=0, keepdims=True)
        dd_ref[0:3] += _mm_g(rfn, dz, ((0,), (0,)), exact)

        dg = _mm_gp(dproj, w_parts, ((1,), (1,)), exact)  # (tq, cin)
        dfeat_ref[0] += _scatter_rows(onehot, dg, exact)

        drfn = _mm_gp(dz, d_parts, ((1,), (1,)), exact)  # (tq, 3)
        drf = _rf_chain_bwd(rf, norm, inv, drfn)
        dcv = dcv - drf
        dvsrc_ref[0] += _scatter_rows(onehot, drf, exact)

    dvq_ref[0] = dcv


def _surface_bwd_kernel(*refs, s: int, co: int, k: int, nv: int, nd: int,
                        exact: bool):
    """verts parts | vt | idx | d parts | win | gbar ->
    dvsrc (1,n,3) | dvq (1,tq,3) | dd (8,S·Co)."""
    it = iter(refs)
    v_parts = [next(it)[0] for _ in range(nv)]
    vt_parts = [next(it)[0] for _ in range(nv)]
    idx_ref = next(it)
    d_parts = [next(it)[...] for _ in range(nd)]
    win_ref = next(it)
    gbar_ref = next(it)
    dvsrc_ref = next(it)
    dvq_ref = next(it)
    dd_ref = next(it)

    n_pad = v_parts[0].shape[0]
    tq = vt_parts[0].shape[0]
    cv = sum(p.astype(jnp.float32) for p in vt_parts)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n_pad), 1)
    win = win_ref[0]
    gb = gbar_ref[0] / s
    gb_rep = jnp.concatenate([gb] * s, axis=1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dvsrc_ref[...] = jnp.zeros_like(dvsrc_ref)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dd_ref[...] = jnp.zeros_like(dd_ref)

    dcv = jnp.zeros((tq, 3), jnp.float32)
    for j in range(k):
        idx_j = idx_ref[0, :, j:j + 1]
        onehot = (iota_n == idx_j).astype(jnp.bfloat16)
        gxyz = _gather(onehot, v_parts)
        rf, norm, inv, rfn = _rf_chain(gxyz, cv)
        theta = _theta_relu(rfn, d_parts, exact)

        sel = (win == j).astype(jnp.float32)
        dz = jnp.where(theta > 0, sel * gb_rep, 0.0)

        dd_ref[0:3] += _mm_g(rfn, dz, ((0,), (0,)), exact)
        drfn = _mm_gp(dz, d_parts, ((1,), (1,)), exact)
        drf = _rf_chain_bwd(rf, norm, inv, drfn)
        dcv = dcv - drf
        dvsrc_ref[0] += _scatter_rows(onehot, drf, exact)

    dvq_ref[0] = dcv


def _orl_bwd_kernel(*refs, k: int, n_valid: int, tq: int, exact: bool):
    """feat parts | idx | win (1,tq,C) | gbar (1,8,C) -> dfeat (1,n,C)."""
    it = iter(refs)
    nf = len(refs) - 4
    f_parts = [next(it)[0] for _ in range(nf)]  # noqa: F841 (shape source)
    idx_ref = next(it)
    win_ref = next(it)
    gbar_ref = next(it)
    dfeat_ref = next(it)

    n_pad = f_parts[0].shape[0]
    c = f_parts[0].shape[1]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tq, n_pad), 1)
    win = win_ref[0]
    gbN = gbar_ref[0, 0:1, :] / n_valid  # (1, C)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    row = pl.program_id(1) * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    valid = (row < n_valid).astype(jnp.float32)
    for j in range(k):
        idx_j = idx_ref[0, :, j:j + 1]
        onehot = (iota_n == idx_j).astype(jnp.bfloat16)
        sel = (win == j).astype(jnp.float32) * valid
        dfeat_ref[0] += _scatter_rows(onehot, sel * gbN, exact)


# ---------------------------------------------------------------------------
# tile-size pickers (VMEM-aware)
# ---------------------------------------------------------------------------

_FWD_BUDGET = 11 * 1024 * 1024
_BWD_BUDGET = 9 * 1024 * 1024


def _lanes(c):
    return ((c + 127) // 128) * 128


def _pick_tq_fwd(tq_req, n_src, cin, s_co, co, exact, want_win):
    fixed = n_src * (_lanes(cin) * 2 * _n_feat_parts(exact)  # feat parts
                     + _lanes(3) * 2 * (2 if exact else 1))  # verts parts
    fixed += cin * s_co * 2 * (2 if exact else 1) + 8 * s_co * 4 * 3
    per_row = (s_co * 4 * (5 if exact else 4)  # macc + proj/theta/prod temps
               + (s_co * 4 if want_win else 0)
               + n_src * 2  # onehot
               + _lanes(cin) * 4 + _lanes(3) * 4 * 4 + _lanes(co) * 4 + 128 * 4)
    tq = max(8, (tq_req // 8) * 8)
    while tq > 8 and fixed + tq * per_row > _FWD_BUDGET:
        tq -= 8
    return tq


def _pick_tq_bwd(tq_req, n_src, cin, s_co, co, exact):
    # Mosaic double-buffers every in/out block (×2 below); measured headroom on
    # top of that is what _BWD_BUDGET leaves of the 16 MB scoped VMEM
    fixed = 2 * n_src * (_lanes(cin) * 2 * _n_feat_parts(exact)
                         + _lanes(3) * 2 * (2 if exact else 1)
                         + _lanes(cin) * 4 + _lanes(3) * 4)  # dfeat + dvsrc
    fixed += cin * s_co * (2 * 2 * (2 if exact else 1) + 2 * 4)  # w parts + dw
    fixed += 8 * s_co * 4 * 4 * 2
    per_row = (s_co * 4 * 8  # win/gb_rep/proj/z/theta/sel/dprod/dz
               + 2 * s_co * (4 + 4)  # win + gbar blocks double-buffered
               + n_src * 2
               + _lanes(cin) * 4 * 3 + _lanes(3) * 4 * 6 + _lanes(co) * 4)
    tq = max(8, (tq_req // 8) * 8)
    while tq > 8 and fixed + tq * per_row > _BWD_BUDGET:
        tq -= 8
    return tq


# ---------------------------------------------------------------------------
# pallas_call builders
# ---------------------------------------------------------------------------

def _support_prep(feature_map, vertices, idx, weights, bias, dirs, exact, tq,
                  want_win, vertices_q=None):
    """Pad + split the inputs; returns (arrays, specs, shapes, dims).

    ``vertices_q`` (B, NQ, 3) supplies a separate query set whose rows the
    ``idx`` grid tiles (the sequence-parallel path: local queries against the
    resident all-gathered source).  Splitting is elementwise, so a query slice
    of the source splits identically to the source itself — the self-rf-zero
    invariant holds across the query/source separation."""
    B, N, cin = feature_map.shape
    NQ = idx.shape[1]
    K = idx.shape[-1]
    s_co = weights.shape[-1]
    n_src = ((N + 7) // 8) * 8
    nq = ((NQ + tq - 1) // tq) * tq
    k_pad = ((K + 127) // 128) * 128

    xyz_split = _xyz_parts(vertices, exact)
    f_parts = [_pad_axis(p, n_src, 1) for p in _feat_parts(feature_map, exact)]
    v_parts = [_pad_axis(p, n_src, 1) for p in xyz_split]
    # query centres ship as the SAME splits so self-neighbour rf is exactly 0
    q_split = (xyz_split if vertices_q is None
               else _xyz_parts(vertices_q, exact))
    vt_parts = [_pad_axis(p, nq, 1) for p in q_split]
    idxp = _pad_axis(_pad_axis(idx.astype(jnp.int32), nq, 1), k_pad, 2)
    w_parts = _w_parts(weights, exact)
    d_parts = _w_parts(dirs, exact)

    args = (f_parts + v_parts + vt_parts + [idxp] + w_parts
            + [bias.astype(jnp.float32).reshape(1, -1)] + d_parts)
    in_specs = (
        [pl.BlockSpec((1, n_src, cin), lambda i, j: (i, 0, 0)) for _ in f_parts]
        + [pl.BlockSpec((1, n_src, 3), lambda i, j: (i, 0, 0)) for _ in v_parts]
        + [pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0)) for _ in vt_parts]
        + [pl.BlockSpec((1, tq, k_pad), lambda i, j: (i, j, 0))]
        + [pl.BlockSpec((cin, s_co), lambda i, j: (0, 0)) for _ in w_parts]
        + [pl.BlockSpec((1, s_co), lambda i, j: (0, 0))]
        + [pl.BlockSpec((3, s_co), lambda i, j: (0, 0)) for _ in d_parts])
    dims = dict(nf=len(f_parts), nv=len(v_parts), nw=len(w_parts),
                nd=len(d_parts))
    return args, in_specs, (B, N, cin, K, s_co, n_src, nq, k_pad), dims


def _support_fwd_call(feature_map, vertices, idx, weights, bias, dirs, *,
                      s, co, tq, exact, interpret, want_win, vertices_q=None,
                      slots=2):
    cin, s_co = weights.shape
    N = feature_map.shape[1]
    n_src = ((N + 7) // 8) * 8
    tq = _pick_tq_fwd(tq, n_src, cin, s_co, co, exact, want_win)
    args, in_specs, shp, dims = _support_prep(
        feature_map, vertices, idx, weights, bias, dirs, exact, tq, want_win,
        vertices_q)
    B, N, cin, K, s_co, n_src, nq, k_pad = shp

    out_shape = [jax.ShapeDtypeStruct((B, nq, co), jnp.float32)]
    out_specs = [pl.BlockSpec((1, tq, co), lambda i, j: (i, j, 0))]
    if want_win:
        out_shape.append(jax.ShapeDtypeStruct((B, nq, s_co), jnp.int32))
        out_specs.append(pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)))

    out = pl.pallas_call(
        functools.partial(_support_fwd_kernel, s=s, co=co, k=K, exact=exact,
                          want_win=want_win, slots=slots, **dims),
        out_shape=tuple(out_shape) if want_win else out_shape[0],
        grid=(B, nq // tq),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if want_win else out_specs[0],
        interpret=interpret,
    )(*args)
    return out, tq


def _support_bwd_call(feature_map, vertices, idx, weights, bias, dirs, win,
                      gbar, *, s, co, tq, exact, interpret):
    cin, s_co = weights.shape
    N = feature_map.shape[1]
    n_src = ((N + 7) // 8) * 8
    tq = _pick_tq_bwd(tq, n_src, cin, s_co, co, exact)
    args, in_specs, shp, dims = _support_prep(
        feature_map, vertices, idx, weights, bias, dirs, exact, tq, False)
    B, N, cin, K, s_co, n_src, nq, k_pad = shp
    win = _pad_axis(win, nq, 1)
    gbar = _pad_axis(gbar.astype(jnp.float32), nq, 1)
    args = list(args) + [win, gbar]
    in_specs = in_specs + [
        pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, tq, co), lambda i, j: (i, j, 0)),
    ]

    dfeat, dvsrc, dvq, dw, db, dd = pl.pallas_call(
        functools.partial(_support_bwd_kernel, s=s, co=co, k=K, exact=exact,
                          **dims),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_src, cin), jnp.float32),
            jax.ShapeDtypeStruct((B, n_src, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, nq, 3), jnp.float32),
            jax.ShapeDtypeStruct((cin, s_co), jnp.float32),
            jax.ShapeDtypeStruct((8, s_co), jnp.float32),
            jax.ShapeDtypeStruct((8, s_co), jnp.float32),
        ),
        grid=(B, nq // tq),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, n_src, cin), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_src, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((cin, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((8, s_co), lambda i, j: (0, 0)),
            pl.BlockSpec((8, s_co), lambda i, j: (0, 0)),
        ),
        interpret=interpret,
    )(*args)
    dverts = dvsrc[:, :N] + dvq[:, :N]
    return dfeat[:, :N], dverts, dw, db[0], dd[0:3]


def _surface_prep(vertices, idx, dirs, exact, tq, want_win, vertices_q=None):
    B, N, _ = vertices.shape
    NQ = idx.shape[1]
    K = idx.shape[-1]
    s_co = dirs.shape[-1]
    n_src = ((N + 7) // 8) * 8
    nq = ((NQ + tq - 1) // tq) * tq
    k_pad = ((K + 127) // 128) * 128

    xyz_split = _xyz_parts(vertices, exact)
    v_parts = [_pad_axis(p, n_src, 1) for p in xyz_split]
    q_split = (xyz_split if vertices_q is None
               else _xyz_parts(vertices_q, exact))
    vt_parts = [_pad_axis(p, nq, 1) for p in q_split]
    idxp = _pad_axis(_pad_axis(idx.astype(jnp.int32), nq, 1), k_pad, 2)
    d_parts = _w_parts(dirs, exact)

    args = v_parts + vt_parts + [idxp] + d_parts
    in_specs = (
        [pl.BlockSpec((1, n_src, 3), lambda i, j: (i, 0, 0)) for _ in v_parts]
        + [pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0)) for _ in vt_parts]
        + [pl.BlockSpec((1, tq, k_pad), lambda i, j: (i, j, 0))]
        + [pl.BlockSpec((3, s_co), lambda i, j: (0, 0)) for _ in d_parts])
    dims = dict(nv=len(v_parts), nd=len(d_parts))
    return args, in_specs, (B, N, K, s_co, n_src, nq, k_pad), dims


def _surface_fwd_call(vertices, idx, dirs, *, s, co, tq, exact, interpret,
                      want_win, vertices_q=None, slots=2):
    s_co = dirs.shape[-1]
    N = vertices.shape[1]
    n_src = ((N + 7) // 8) * 8
    tq = _pick_tq_fwd(tq, n_src, 0, s_co, co, exact, want_win)
    args, in_specs, shp, dims = _surface_prep(vertices, idx, dirs, exact, tq,
                                              want_win, vertices_q)
    B, N, K, s_co, n_src, nq, k_pad = shp

    out_shape = [jax.ShapeDtypeStruct((B, nq, co), jnp.float32)]
    out_specs = [pl.BlockSpec((1, tq, co), lambda i, j: (i, j, 0))]
    if want_win:
        out_shape.append(jax.ShapeDtypeStruct((B, nq, s_co), jnp.int32))
        out_specs.append(pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)))

    out = pl.pallas_call(
        functools.partial(_surface_fwd_kernel, s=s, co=co, k=K, exact=exact,
                          want_win=want_win, slots=slots, **dims),
        out_shape=tuple(out_shape) if want_win else out_shape[0],
        grid=(B, nq // tq),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if want_win else out_specs[0],
        interpret=interpret,
    )(*args)
    return out, tq


def _surface_bwd_call(vertices, idx, dirs, win, gbar, *, s, co, tq, exact,
                      interpret):
    s_co = dirs.shape[-1]
    N = vertices.shape[1]
    n_src = ((N + 7) // 8) * 8
    tq = _pick_tq_bwd(tq, n_src, 0, s_co, co, exact)
    args, in_specs, shp, dims = _surface_prep(vertices, idx, dirs, exact, tq,
                                              False)
    B, N, K, s_co, n_src, nq, k_pad = shp
    win = _pad_axis(win, nq, 1)
    gbar = _pad_axis(gbar.astype(jnp.float32), nq, 1)
    args = list(args) + [win, gbar]
    in_specs = in_specs + [
        pl.BlockSpec((1, tq, s_co), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, tq, co), lambda i, j: (i, j, 0)),
    ]

    dvsrc, dvq, dd = pl.pallas_call(
        functools.partial(_surface_bwd_kernel, s=s, co=co, k=K, exact=exact,
                          **dims),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_src, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, nq, 3), jnp.float32),
            jax.ShapeDtypeStruct((8, s_co), jnp.float32),
        ),
        grid=(B, nq // tq),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, n_src, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((8, s_co), lambda i, j: (0, 0)),
        ),
        interpret=interpret,
    )(*args)
    return dvsrc[:, :N] + dvq[:, :N], dd[0:3]


def _orl_prep(feature, idx, exact, tq):
    # idx may tile fewer query rows than the feature source has (the
    # sequence-parallel path: local queries, all-gathered source)
    B, N, C = feature.shape
    NQ = idx.shape[1]
    K = idx.shape[-1]
    nq = ((NQ + tq - 1) // tq) * tq
    n_src = ((N + 7) // 8) * 8
    k_pad = ((K + 127) // 128) * 128
    f_parts = [_pad_axis(p, n_src, 1) for p in _feat_parts(feature, exact)]
    idxp = _pad_axis(_pad_axis(idx.astype(jnp.int32), nq, 1), k_pad, 2)
    args = f_parts + [idxp]
    in_specs = (
        [pl.BlockSpec((1, n_src, C), lambda i, j: (i, 0, 0)) for _ in f_parts]
        + [pl.BlockSpec((1, tq, k_pad), lambda i, j: (i, j, 0))])
    return args, in_specs, (B, N, C, K, n_src, nq, k_pad)


def _orl_fwd_call(feature, idx, *, tq, exact, interpret, want_win, slots=2):
    args, in_specs, shp = _orl_prep(feature, idx, exact, tq)
    B, N, C, K, n_src, nq, k_pad = shp
    nq_valid = idx.shape[1]  # mean over the QUERY rows this call reduces
    out_shape = [jax.ShapeDtypeStruct((B, 8, C), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 8, C), lambda i, j: (i, 0, 0))]
    if want_win:
        out_shape.append(jax.ShapeDtypeStruct((B, nq, C), jnp.int32))
        out_specs.append(pl.BlockSpec((1, tq, C), lambda i, j: (i, j, 0)))
    out = pl.pallas_call(
        functools.partial(_orl_fwd_kernel, k=K, n_valid=nq_valid, tq=tq,
                          want_win=want_win, slots=slots),
        out_shape=tuple(out_shape) if want_win else out_shape[0],
        grid=(B, nq // tq),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if want_win else out_specs[0],
        interpret=interpret,
    )(*args)
    if want_win:
        return out[0][:, 0:1, :] / nq_valid, out[1]
    return out[:, 0:1, :] / nq_valid


def _orl_bwd_call(feature, idx, win, gbar, *, tq, exact, interpret):
    args, in_specs, shp = _orl_prep(feature, idx, exact, tq)
    B, N, C, K, n_src, nq, k_pad = shp
    win = _pad_axis(win, nq, 1)
    gbar8 = jnp.zeros((B, 8, C), jnp.float32).at[:, 0:1, :].set(
        gbar.astype(jnp.float32))
    args = list(args) + [win, gbar8]
    in_specs = in_specs + [
        pl.BlockSpec((1, tq, C), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, 8, C), lambda i, j: (i, 0, 0)),
    ]
    dfeat = pl.pallas_call(
        functools.partial(_orl_bwd_kernel, k=K, n_valid=N, tq=tq, exact=exact),
        out_shape=jax.ShapeDtypeStruct((B, n_src, C), jnp.float32),
        grid=(B, nq // tq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_src, C), lambda i, j: (i, 0, 0)),
        interpret=interpret,
    )(*args)
    return dfeat[:, :N]


# ---------------------------------------------------------------------------
# custom-VJP public ops
# ---------------------------------------------------------------------------

def _float0(x):
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.lru_cache(maxsize=None)
def _support_diff_fn(s, co, tq, exact, interpret, slots=2):
    @jax.custom_vjp
    def fn(feat, verts, idx, w, b, d):
        out, _ = _support_fwd_call(feat, verts, idx, w, b, d, s=s, co=co, tq=tq,
                                   exact=exact, interpret=interpret,
                                   want_win=False, slots=slots)
        return out[:, :feat.shape[1]]

    def fwd(feat, verts, idx, w, b, d):
        (out, win), used_tq = _support_fwd_call(
            feat, verts, idx, w, b, d, s=s, co=co, tq=tq, exact=exact,
            interpret=interpret, want_win=True)
        return out[:, :feat.shape[1]], (feat, verts, idx, w, b, d, win)

    def bwd(res, gbar):
        feat, verts, idx, w, b, d, win = res
        N = feat.shape[1]
        dfeat, dverts, dw, db, dd = _support_bwd_call(
            feat, verts, idx, w, b, d, win[:, :N], gbar, s=s, co=co, tq=tq,
            exact=exact, interpret=interpret)
        return (dfeat.astype(feat.dtype), dverts.astype(verts.dtype),
                _float0(idx), dw.astype(w.dtype), db.astype(b.dtype),
                dd.astype(d.dtype))

    fn.defvjp(fwd, bwd)
    return fn


@functools.lru_cache(maxsize=None)
def _surface_diff_fn(s, co, tq, exact, interpret, slots=2):
    @jax.custom_vjp
    def fn(verts, idx, d):
        out, _ = _surface_fwd_call(verts, idx, d, s=s, co=co, tq=tq,
                                   exact=exact, interpret=interpret,
                                   want_win=False, slots=slots)
        return out[:, :verts.shape[1]]

    def fwd(verts, idx, d):
        (out, win), _ = _surface_fwd_call(verts, idx, d, s=s, co=co, tq=tq,
                                          exact=exact, interpret=interpret,
                                          want_win=True)
        return out[:, :verts.shape[1]], (verts, idx, d, win)

    def bwd(res, gbar):
        verts, idx, d, win = res
        N = verts.shape[1]
        dverts, dd = _surface_bwd_call(verts, idx, d, win[:, :N], gbar, s=s,
                                       co=co, tq=tq, exact=exact,
                                       interpret=interpret)
        return dverts.astype(verts.dtype), _float0(idx), dd.astype(d.dtype)

    fn.defvjp(fwd, bwd)
    return fn


@functools.lru_cache(maxsize=None)
def _orl_diff_fn(tq, exact, interpret, slots=2):
    @jax.custom_vjp
    def fn(feat, idx):
        return _orl_fwd_call(feat, idx, tq=tq, exact=exact,
                             interpret=interpret, want_win=False, slots=slots)

    def fwd(feat, idx):
        out, win = _orl_fwd_call(feat, idx, tq=tq, exact=exact,
                                 interpret=interpret, want_win=True)
        return out, (feat, idx, win)

    def bwd(res, gbar):
        feat, idx, win = res
        N = feat.shape[1]
        dfeat = _orl_bwd_call(feat, idx, win[:, :N], gbar, tq=tq, exact=exact,
                              interpret=interpret)
        return dfeat.astype(feat.dtype), _float0(idx)

    fn.defvjp(fwd, bwd)
    return fn


@functools.partial(jax.jit, static_argnames=("support_num", "out_channel", "tq",
                                             "exact", "interpret", "slots"))
def hs_support_fused(feature_map: jnp.ndarray, vertices: jnp.ndarray,
                     idx: jnp.ndarray, weights: jnp.ndarray, bias: jnp.ndarray,
                     dirs: jnp.ndarray, support_num: int, out_channel: int,
                     tq: int = 0, exact: bool = False,
                     interpret: bool = False,
                     vertices_q: jnp.ndarray | None = None,
                     slots: int = 2) -> jnp.ndarray:
    """Fused HS support reduction with in-kernel gather + rf.

    feature_map (B, N, Cin), vertices (B, N, 3), idx (B, N, K) int32,
    weights (Cin, S·Co), bias (S·Co,), dirs (3, S·Co) -> (B, N, Co) f32.
    ``mean_s max_k relu(rf_norm·dir_s) · (feat[idx] @ W_s + b_s)`` with the
    gather and rf construction inside the kernel.  ``exact=True`` is the
    f32-faithful path (split gathers + bf16x3 matmuls); ``exact=False`` the
    bf16 fast path.  Differentiable via a fused backward kernel (cotangents
    for feature_map, vertices, weights, bias, dirs).

    ``vertices_q`` (B, NQ, 3) separates queries from the resident source
    (sequence-parallel serving: idx rows/outputs follow the queries, gathers
    address the full source).  Forward-only — SP is an inference path.
    """
    if tq <= 0:
        # swept at B=256 (docs/PERFORMANCE.md): exact tiles want more VMEM per
        # row (split parts + bf16x3 temporaries), fast prefers 128 at large N
        # re-swept after slot pairing (docs/PERFORMANCE.md): exact tiles want
        # the most VMEM headroom per row (split parts + bf16x3 temporaries)
        if exact:
            tq = 32 if feature_map.shape[1] < 512 else 64
        else:
            tq = 64 if feature_map.shape[1] < 512 else 128
    if vertices_q is not None:
        out, _ = _support_fwd_call(feature_map, vertices, idx, weights, bias,
                                   dirs, s=support_num, co=out_channel, tq=tq,
                                   exact=exact, interpret=interpret,
                                   want_win=False, vertices_q=vertices_q,
                                   slots=slots)
        return out[:, :idx.shape[1]]
    fn = _support_diff_fn(support_num, out_channel, tq, exact, interpret,
                          slots)
    return fn(feature_map, vertices, idx, weights, bias, dirs)


@functools.partial(jax.jit, static_argnames=("support_num", "out_channel", "tq",
                                             "exact", "interpret", "slots"))
def hs_surface_fused(vertices: jnp.ndarray, idx: jnp.ndarray, dirs: jnp.ndarray,
                     support_num: int, out_channel: int, tq: int = 0,
                     exact: bool = False, interpret: bool = False,
                     vertices_q: jnp.ndarray | None = None,
                     slots: int = 2) -> jnp.ndarray:
    """Fused surface-layer reduction: vertices (B, N, 3), idx (B, N, K),
    dirs (3, S·Co) -> (B, N, Co) f32 theta-only reduction.  Differentiable.
    ``vertices_q`` separates queries from the resident source (SP serving,
    forward-only)."""
    if tq <= 0:
        tq = 64 if exact else 128  # re-swept after slot pairing at B=256
    if vertices_q is not None:
        out, _ = _surface_fwd_call(vertices, idx, dirs, s=support_num,
                                   co=out_channel, tq=tq, exact=exact,
                                   interpret=interpret, want_win=False,
                                   vertices_q=vertices_q, slots=slots)
        return out[:, :idx.shape[1]]
    fn = _surface_diff_fn(support_num, out_channel, tq, exact, interpret,
                          slots)
    return fn(vertices, idx, dirs)


@functools.partial(jax.jit, static_argnames=("tq", "exact", "interpret",
                                             "slots"))
def orl_global_fused(feature: jnp.ndarray, idx: jnp.ndarray, tq: int = 128,
                     exact: bool = False, interpret: bool = False,
                     slots: int = 2) -> jnp.ndarray:
    """Fused ORL global branch (gcn3d.get_ORL_global :211-218):
    feature (B, N, C), idx (B, N, K) -> (B, 1, C) = mean_n max_k feat[knn].

    The XLA path materializes the (B, K, N, C) gathered tensor in HBM before
    the max; here the per-batch feature block stays in VMEM and only the (1, C)
    accumulator is written.  Differentiable: the backward scatters the winning
    slot's cotangent by one-hot transpose matmuls."""
    fn = _orl_diff_fn(tq, exact, interpret, slots)
    return fn(feature, idx)

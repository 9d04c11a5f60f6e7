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
        # Mosaic supports DEFAULT/HIGHEST only; fast mode takes the bf16 pass.
        # bf16 inputs must also take DEFAULT: there is no higher-precision
        # pass to make from bf16 data, and Mosaic rejects a HIGHEST-precision
        # NT-matmul on bf16 vectors (hit by the streamed path at N>2048 in
        # fast mode — the flat fast path always passed DEFAULT).
        prec = (jax.lax.Precision.DEFAULT
                if fast or x.dtype == jnp.bfloat16
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


def _knn_kernel_streamed(x_ref, q_ref, out_ref, run_d, run_i, *, k: int,
                         n_valid: int, ts: int, n_blocks: int, use_mxu: bool):
    """Streamed-source variant: one (batch, query-tile, source-block) program.

    Source points stream through VMEM in (TS, D) blocks (the pipeline
    double-buffers them); a running top-k — distances ``run_d`` (TQ, k) and
    global indices ``run_i`` (TQ, k) — lives in scratch and persists across the
    innermost grid axis.  Each block is merged by k first-occurrence-argmin
    extraction passes over [running | block] (same total reduction work as the
    flat kernel: k passes over N columns overall).  VMEM is flat in N — this is
    the SURVEY §5.7 large-N scaling path (flash-attention-style key streaming).
    """
    s = pl.program_id(2)
    x = x_ref[0]  # (TS, D) current source block
    q = q_ref[0]  # (TQ, D)
    tq = q.shape[0]

    @pl.when(s == 0)
    def _init():
        run_d[...] = jnp.full(run_d.shape, _BIG, jnp.float32)
        run_i[...] = jnp.full(run_i.shape, _INT_BIG, jnp.int32)

    d_blk = _distance_tile(x, q, use_mxu, fast=False)  # (TQ, TS)
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1) + s * ts
    d_blk = jnp.where(col < n_valid, d_blk, _BIG)

    d = jnp.concatenate([run_d[...], d_blk], axis=1)  # (TQ, k+TS)
    gi = jnp.concatenate([run_i[...], col], axis=1)

    # unrolled extraction with per-column ref stores (Mosaic has no scatter);
    # the running state was already read into d/gi above, so overwriting it
    # column-by-column here is safe
    for j in range(k):
        m = jnp.min(d, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(d <= m, gi, _INT_BIG), axis=1)  # (TQ,)
        run_d[:, j] = m[:, 0]
        run_i[:, j] = idx
        d = jnp.where(gi == idx[:, None], _BIG, d)

    @pl.when(s == n_blocks - 1)
    def _emit():
        out_ref[0] = run_i[...]


def _knn_kernel_tmaj(x_ref, qt_ref, out_ref, *, k: int, n_valid: int,
                     use_mxu: bool, fast: bool, extract: str = "mask"):
    """Candidate-major layout: distances (Npad, TQ) with candidates on the
    SUBLANE axis.  Each of the k+1 min-reductions is then a tree of elementwise
    vreg mins (Npad/8 ops) + 3 intra-vreg shuffles, instead of the lane-major
    layout's per-row-group cross-lane shuffle cascades — measured ~1.5x faster
    extraction at (256, 1028, k=21).

    x_ref: (1, Npad, D) source points resident in VMEM;
    qt_ref: (1, D_pad, TQ) the query tile TRANSPOSED;
    out_ref: (1, kk, TQ) int32 — row j holds the j-th neighbour of every query
    (the wrapper transposes back).

    ``extract`` (fast path only — the packed keys are UNIQUE, indices live in
    the low bits):
      * "mask": per pass, min then mask the winner out of the carried tile —
        the carried where() rematerializes the (Npad, TQ) tile in VMEM every
        pass (N reads + N writes per extraction);
      * "thresh": the j-th min is min over {key > m_(j-1)} — the tile is never
        mutated, so each pass is a read-only sweep (no writeback);
      * "pair": two smallest per sweep via a (m1, m2) running-pair fold, with
        threshold chaining between sweeps — halves the number of tile sweeps.
    """
    x = x_ref[0]  # (Npad, D)
    npad = x.shape[0]
    tq = qt_ref.shape[2]

    if use_mxu:
        # bf16 inputs must take DEFAULT even when fast=False: Mosaic rejects a
        # HIGHEST-precision matmul on bf16 vectors (same class as the streamed
        # path's N>2048 failure — see _distance_tile)
        prec = (jax.lax.Precision.DEFAULT
                if fast or x.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        qt = qt_ref[0, :x.shape[1]]  # (D, TQ)
        inner = jax.lax.dot_general(
            x, qt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (Npad, TQ)
        x_sq = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        q_sq = jnp.sum(qt.astype(jnp.float32) ** 2, axis=0, keepdims=True)
        d = x_sq + q_sq - 2.0 * inner
    else:
        d = jnp.zeros((npad, tq), jnp.float32)
        for dim in range(x.shape[1]):
            diff = (x[:, dim:dim + 1].astype(jnp.float32)
                    - qt_ref[0, dim:dim + 1, :].astype(jnp.float32))
            d = d + diff * diff

    row = jax.lax.broadcasted_iota(jnp.int32, (npad, tq), 0)

    if fast:
        d_bits = jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0), jnp.int32)
        key = jnp.where(row < n_valid, (d_bits & ~_IDX_MASK) | row, _INT_BIG)

        if extract == "thresh":
            m = jnp.min(key, axis=0)  # (TQ,)
            out_ref[0, 0] = m & _IDX_MASK

            def ext_t(j, m):
                # keys are unique: min over {key > m} IS the next smallest
                m = jnp.min(jnp.where(key > m[None, :], key, _INT_BIG), axis=0)
                out_ref[0, j] = m & _IDX_MASK
                return m

            jax.lax.fori_loop(1, k, ext_t, m, unroll=True)
        elif extract == "pair":
            def two_smallest(t):
                """(R, TQ) -> two smallest per column, one sweep.

                Fold halves carrying (m1, m2) elementwise pairs; finish the
                last 8 sublanes with a min + masked second-min."""
                m1, m2 = t, None
                while m1.shape[0] > 8:
                    r = m1.shape[0]
                    h = (r + 15) // 16 * 8  # split at a sublane multiple
                    a1, b1 = m1[:h], m1[h:]
                    pad = h - b1.shape[0]
                    if pad:
                        b1 = jnp.concatenate(
                            [b1, jnp.full((pad, b1.shape[1]), _INT_BIG,
                                          jnp.int32)], axis=0)
                    lo = jnp.minimum(a1, b1)
                    hi = jnp.maximum(a1, b1)
                    if m2 is None:
                        m1, m2 = lo, hi
                    else:
                        a2, b2 = m2[:h], m2[h:]
                        if pad:
                            b2 = jnp.concatenate(
                                [b2, jnp.full((pad, b2.shape[1]), _INT_BIG,
                                              jnp.int32)], axis=0)
                        m1 = lo
                        m2 = jnp.minimum(hi, jnp.minimum(a2, b2))
                first = jnp.min(m1, axis=0)
                sec1 = jnp.min(jnp.where(m1 == first[None, :], _INT_BIG, m1),
                               axis=0)
                if m2 is not None:
                    sec1 = jnp.minimum(sec1, jnp.min(m2, axis=0))
                return first, sec1

            m1, m2 = two_smallest(key)
            out_ref[0, 0] = m1 & _IDX_MASK
            if k > 1:
                out_ref[0, 1] = m2 & _IDX_MASK

            for i in range((k - 1) // 2):  # python loop: static store slots
                j = 2 + i * 2
                m1, n2 = two_smallest(
                    jnp.where(key > m2[None, :], key, _INT_BIG))
                out_ref[0, j] = m1 & _IDX_MASK
                if j + 1 < k:
                    out_ref[0, j + 1] = n2 & _IDX_MASK
                m2 = n2
        else:
            def ext_m(j, key):
                m = jnp.min(key, axis=0)  # (TQ,)
                out_ref[0, j] = m & _IDX_MASK
                return jnp.where(key == m[None, :], _INT_BIG, key)

            jax.lax.fori_loop(0, k, ext_m, key, unroll=True)
    else:
        d = jnp.where(row < n_valid, d, _BIG)

        def extract(j, d):
            m = jnp.min(d, axis=0, keepdims=True)  # (1, TQ)
            idx = jnp.min(jnp.where(d <= m, row, npad), axis=0)  # (TQ,)
            out_ref[0, j] = idx
            return jnp.where(row == idx[None, :], _BIG, d)

        jax.lax.fori_loop(0, k, extract, d, unroll=True)


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# above this many padded source points the flat kernel's (Npad, D) + (TQ, Npad)
# VMEM residency stops scaling; stream source blocks instead (SURVEY §5.7)
_STREAM_THRESHOLD = 2048


def _knn_pallas_impl(points: jnp.ndarray, source: jnp.ndarray, k: int,
                     tq: int, interpret: bool, fast: bool, ts: int,
                     tmaj: bool, extract: str = "thresh") -> jnp.ndarray:
    """Shared body: queries ``points`` (B, N, D) against candidates ``source``
    (B, M, D).  ``source`` must contain every query row (self-drop contract)."""
    B, N, D = points.shape
    M = source.shape[1]
    npad = ((M + 127) // 128) * 128
    nq = ((N + tq - 1) // tq) * tq
    dtype = points.dtype if points.dtype == jnp.bfloat16 else jnp.float32
    use_mxu = D > 8
    if not use_mxu and D < 3:
        raise ValueError("D must be >= 3")
    kk = k + 1  # include self, dropped below
    q = _pad_to(points.astype(dtype), nq, 1)

    if npad > _STREAM_THRESHOLD:
        npad = ((M + ts - 1) // ts) * ts
        n_blocks = npad // ts
        x = _pad_to(source.astype(dtype), npad, 1)
        out = pl.pallas_call(
            functools.partial(_knn_kernel_streamed, k=kk, n_valid=M, ts=ts,
                              n_blocks=n_blocks, use_mxu=use_mxu),
            out_shape=jax.ShapeDtypeStruct((B, nq, kk), jnp.int32),
            grid=(B, nq // tq, n_blocks),
            in_specs=[
                pl.BlockSpec((1, ts, D), lambda i, j, s: (i, s, 0)),
                pl.BlockSpec((1, tq, D), lambda i, j, s: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, tq, kk), lambda i, j, s: (i, j, 0)),
            scratch_shapes=[pltpu.VMEM((tq, kk), jnp.float32),
                            pltpu.VMEM((tq, kk), jnp.int32)],
            interpret=interpret,
        )(x, q)
        return out[:, :N, 1:]

    # flat path: pad source with far-away sentinels, queries with zeros
    x = _pad_to(source.astype(dtype), npad, 1)
    if fast and npad > (1 << _IDX_BITS):
        fast = False  # index no longer fits the packed key; fall back to exact

    if tmaj:
        # candidate-major extraction (see _knn_kernel_tmaj): queries ship
        # transposed, neighbours come out k-major and are transposed back
        d_blk = max(8, D)
        qt = _pad_to(jnp.swapaxes(q, 1, 2), d_blk, 1)  # (B, D_pad, nq)
        out = pl.pallas_call(
            functools.partial(_knn_kernel_tmaj, k=kk, n_valid=M,
                              use_mxu=use_mxu, fast=fast, extract=extract),
            out_shape=jax.ShapeDtypeStruct((B, kk, nq), jnp.int32),
            grid=(B, nq // tq),
            in_specs=[
                pl.BlockSpec((1, npad, D), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, d_blk, tq), lambda i, j: (i, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, kk, tq), lambda i, j: (i, 0, j)),
            interpret=interpret,
        )(x, qt)
        return jnp.swapaxes(out, 1, 2)[:, :N, 1:]

    kernel = _knn_kernel_fast if fast else _knn_kernel
    grid = (B, nq // tq)
    out = pl.pallas_call(
        functools.partial(kernel, k=kk, n_valid=M, use_mxu=use_mxu),
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


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "interpret", "fast", "ts",
                                    "tmaj", "extract"))
def knn_indices_pallas(points: jnp.ndarray, k: int, tq: int = 128,
                       interpret: bool = False, fast: bool = False,
                       ts: int = 512, tmaj: bool = True,
                       extract: str = "thresh") -> jnp.ndarray:
    """Indices of the k nearest neighbours excluding self: (B, N, D) -> (B, N, k).

    Drop-in replacement for ``ops.knn.knn_indices`` built on the fused kernel.
    Integer outputs carry no tangents; the custom_jvp below makes that explicit so
    the kernel can sit inside differentiated training graphs (pallas_call itself
    has no autodiff rule).

    Up to ``_STREAM_THRESHOLD`` padded points the whole source cloud sits in
    VMEM; beyond that, source blocks of ``ts`` points stream through VMEM with a
    running top-k merge, so memory stays flat in N.  NB the streamed path (and
    the flat path above 2^11 padded points, where the index no longer fits the
    packed key) always runs the exact extraction — ``fast=True`` is a no-op
    there, so large-N callers get exact-mode performance characteristics.
    """
    return _knn_pallas_impl(points, points, k, tq, interpret, fast, ts, tmaj,
                            extract)


@knn_indices_pallas.defjvp
def _knn_indices_jvp(k, tq, interpret, fast, ts, tmaj, extract, primals,
                     tangents):
    import numpy as _np

    (points,) = primals
    out = knn_indices_pallas(points, k, tq, interpret, fast, ts, tmaj, extract)
    tangent = _np.zeros(out.shape, dtype=jax.dtypes.float0)
    return out, tangent


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "interpret", "fast", "ts",
                                    "tmaj"))
def knn_indices_pallas_qs(queries: jnp.ndarray, source: jnp.ndarray, k: int,
                          tq: int = 128, interpret: bool = False,
                          fast: bool = False, ts: int = 512,
                          tmaj: bool = True) -> jnp.ndarray:
    """Two-array variant: queries (B, N, D) against source (B, M, D) -> (B, N, k)
    source-global indices.  ``source`` must contain every query row (the k+1
    self-drop contract, same as the single-array form) — the sequence-parallel
    serving path satisfies this by passing a shard of the all-gathered cloud."""
    return _knn_pallas_impl(queries, source, k, tq, interpret, fast, ts, tmaj)


@knn_indices_pallas_qs.defjvp
def _knn_indices_qs_jvp(k, tq, interpret, fast, ts, tmaj, primals, tangents):
    import numpy as _np

    queries, source = primals
    out = knn_indices_pallas_qs(queries, source, k, tq, interpret, fast, ts,
                                tmaj)
    tangent = _np.zeros(out.shape, dtype=jax.dtypes.float0)
    return out, tangent

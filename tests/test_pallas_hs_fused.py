"""Correctness of the fully-fused fast-mode HS kernels (in-kernel gather + rf)
against the XLA reference math (gather_neighbors + explicit theta/proj)."""

import jax
import jax.numpy as jnp
import numpy as np

from hspose_tpu.ops.knn import gather_neighbors, neighbor_directions_normalized
from hspose_tpu.ops.pallas_hs_fused import hs_support_fused, hs_surface_fused


def _xla_support(feat, verts, idx, w, b, d, s, co):
    rf = neighbor_directions_normalized(verts, idx)  # (B, N, K, 3)
    g = gather_neighbors(feat, idx)  # (B, N, K, Cin)
    theta = jax.nn.relu(jnp.einsum("bnkd,ds->bnks", rf, d))  # (B,N,K,S·Co)
    proj = jnp.einsum("bnki,is->bnks", g, w) + b
    prod = (theta * proj).reshape(*theta.shape[:3], s, co)
    return jnp.mean(jnp.max(prod, axis=2), axis=2)


def _xla_surface(verts, idx, d, s, co):
    rf = neighbor_directions_normalized(verts, idx)
    theta = jax.nn.relu(jnp.einsum("bnkd,ds->bnks", rf, d))
    theta = theta.reshape(*theta.shape[:3], s, co)
    return jnp.mean(jnp.max(theta, axis=2), axis=2)


def test_support_fused_matches_xla(rng):
    B, N, K, cin, s, co = 2, 200, 10, 32, 3, 64
    feat = rng.normal(size=(B, N, cin)).astype(np.float32)
    verts = rng.normal(scale=0.2, size=(B, N, 3)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, K)).astype(np.int32)
    w = (rng.normal(size=(cin, s * co)) * 0.1).astype(np.float32)
    b = (rng.normal(size=(s * co,)) * 0.1).astype(np.float32)
    d = rng.normal(size=(3, s * co)).astype(np.float32)

    feat_bf = jnp.asarray(feat).astype(jnp.bfloat16).astype(jnp.float32)
    verts_bf = jnp.asarray(verts).astype(jnp.bfloat16).astype(jnp.float32)
    want = np.asarray(_xla_support(feat_bf, verts_bf, jnp.asarray(idx),
                                   jnp.asarray(w), jnp.asarray(b),
                                   jnp.asarray(d), s, co))
    got = np.asarray(hs_support_fused(jnp.asarray(feat), jnp.asarray(verts),
                                      jnp.asarray(idx), jnp.asarray(w),
                                      jnp.asarray(b), jnp.asarray(d), s, co,
                                      tq=64, interpret=True))
    # one bf16 MXU pass for theta/proj -> ~1e-2 relative
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-2 * np.abs(want).max())


def test_surface_fused_matches_xla(rng):
    B, N, K, s, co = 2, 200, 8, 3, 32
    verts = rng.normal(scale=0.2, size=(B, N, 3)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, K)).astype(np.int32)
    d = rng.normal(size=(3, s * co)).astype(np.float32)

    verts_bf = jnp.asarray(verts).astype(jnp.bfloat16).astype(jnp.float32)
    want = np.asarray(_xla_surface(verts_bf, jnp.asarray(idx), jnp.asarray(d),
                                   s, co))
    got = np.asarray(hs_surface_fused(jnp.asarray(verts), jnp.asarray(idx),
                                      jnp.asarray(d), s, co, tq=64,
                                      interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-2 * np.abs(want).max())


def test_orl_fused_matches_xla(rng):
    from hspose_tpu.ops.pallas_hs_fused import orl_global_fused

    B, N, K, C = 2, 200, 10, 64
    feat = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, K)).astype(np.int32)
    feat_bf = jnp.asarray(feat).astype(jnp.bfloat16).astype(jnp.float32)
    want = np.asarray(jnp.mean(jnp.max(
        gather_neighbors(feat_bf, jnp.asarray(idx)), axis=2), axis=1,
        keepdims=True))
    got = np.asarray(orl_global_fused(jnp.asarray(feat), jnp.asarray(idx),
                                      tq=64, interpret=True))
    assert got.shape == (B, 1, C)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5 * np.abs(want).max())


def test_support_fused_exact_matches_xla_f32(rng):
    """exact=True must track the full-f32 XLA math to the split/bf16x3 budget
    (~1e-4 absolute at unit scale)."""
    B, N, K, cin, s, co = 2, 200, 10, 32, 3, 64
    feat = rng.normal(size=(B, N, cin)).astype(np.float32)
    verts = rng.normal(scale=0.2, size=(B, N, 3)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, K)).astype(np.int32)
    w = (rng.normal(size=(cin, s * co)) * 0.1).astype(np.float32)
    b = (rng.normal(size=(s * co,)) * 0.1).astype(np.float32)
    d = rng.normal(size=(3, s * co)).astype(np.float32)

    want = np.asarray(_xla_support(jnp.asarray(feat), jnp.asarray(verts),
                                   jnp.asarray(idx), jnp.asarray(w),
                                   jnp.asarray(b), jnp.asarray(d), s, co))
    got = np.asarray(hs_support_fused(jnp.asarray(feat), jnp.asarray(verts),
                                      jnp.asarray(idx), jnp.asarray(w),
                                      jnp.asarray(b), jnp.asarray(d), s, co,
                                      tq=64, exact=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4 * np.abs(want).max())


class TestFusedVJP:
    """Gradients of the fused kernels vs the XLA reference math + finite
    differences (the VERDICT r2 #1 acceptance style, cf. test_pallas_hs.py)."""

    @staticmethod
    def _self_free_idx(rng, B, N, K):
        """Random neighbour indices excluding self (like real KNN output): the
        XLA reference grad is NaN at rf=0 (sqrt'(0)), while the kernels clamp."""
        base = rng.integers(1, N, (B, N, K))
        return ((np.arange(N)[None, :, None] + base) % N).astype(np.int32)

    def _setup_support(self, rng, exact):
        B, N, K, cin, s, co = 2, 96, 6, 16, 2, 32
        feat = jnp.asarray(rng.normal(size=(B, N, cin)).astype(np.float32))
        verts = jnp.asarray(rng.normal(scale=0.3, size=(B, N, 3)).astype(np.float32))
        idx = jnp.asarray(self._self_free_idx(rng, B, N, K))
        w = jnp.asarray((rng.normal(size=(cin, s * co)) * 0.1).astype(np.float32))
        b = jnp.asarray((rng.normal(size=(s * co,)) * 0.1).astype(np.float32))
        d = jnp.asarray(rng.normal(size=(3, s * co)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(B, N, co)).astype(np.float32))

        def loss_pl(feat, verts, w, b, d):
            out = hs_support_fused(feat, verts, idx, w, b, d, s, co, tq=32,
                                   exact=exact, interpret=True)
            return jnp.sum(out * cot)

        def loss_xla(feat, verts, w, b, d):
            return jnp.sum(_xla_support(feat, verts, idx, w, b, d, s, co) * cot)

        return (feat, verts, w, b, d), loss_pl, loss_xla

    def test_support_grads_match_xla(self, rng):
        args, loss_pl, loss_xla = self._setup_support(rng, exact=True)
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4))(*args)
        g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
        names = ["dfeat", "dverts", "dw", "db", "dd"]
        for n, a, b in zip(names, g_pl, g_x):
            scale = max(np.abs(np.asarray(b)).max(), 1e-3)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                       atol=5e-4 * scale, err_msg=n)

    def test_support_grads_finite_difference(self, rng):
        (feat, verts, w, b, d), loss_pl, _ = self._setup_support(rng, exact=True)
        g = jax.grad(loss_pl, argnums=3)(feat, verts, w, b, d)  # db: smallest
        eps = 1e-3
        r = np.random.default_rng(3)
        for _ in range(4):
            i = r.integers(0, b.shape[0])
            bp = b.at[i].add(eps)
            bm = b.at[i].add(-eps)
            fd = (loss_pl(feat, verts, w, bp, d)
                  - loss_pl(feat, verts, w, bm, d)) / (2 * eps)
            # loose: central differences cross max-over-k kinks at this eps
            # (the tight check is the XLA-grad match above)
            np.testing.assert_allclose(float(g[i]), float(fd), rtol=8e-2,
                                       atol=1e-3)

    def test_surface_grads_match_xla(self, rng):
        B, N, K, s, co = 2, 96, 6, 2, 32
        verts = jnp.asarray(rng.normal(scale=0.3, size=(B, N, 3)).astype(np.float32))
        idx = jnp.asarray(self._self_free_idx(rng, B, N, K))
        d = jnp.asarray(rng.normal(size=(3, s * co)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(B, N, co)).astype(np.float32))

        def loss_pl(verts, d):
            return jnp.sum(hs_surface_fused(verts, idx, d, s, co, tq=32,
                                            exact=True, interpret=True) * cot)

        def loss_xla(verts, d):
            return jnp.sum(_xla_surface(verts, idx, d, s, co) * cot)

        g_pl = jax.grad(loss_pl, argnums=(0, 1))(verts, d)
        g_x = jax.grad(loss_xla, argnums=(0, 1))(verts, d)
        for n, a, b in zip(["dverts", "dd"], g_pl, g_x):
            scale = max(np.abs(np.asarray(b)).max(), 1e-3)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                       atol=5e-4 * scale, err_msg=n)

    def test_orl_grads_match_xla(self, rng):
        from hspose_tpu.ops.pallas_hs_fused import orl_global_fused

        B, N, K, C = 2, 96, 6, 32
        feat = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
        cot = jnp.asarray(rng.normal(size=(B, 1, C)).astype(np.float32))

        def loss_pl(feat):
            return jnp.sum(orl_global_fused(feat, idx, tq=32, exact=True,
                                            interpret=True) * cot)

        def loss_xla(feat):
            out = jnp.mean(jnp.max(gather_neighbors(feat, idx), axis=2), axis=1,
                           keepdims=True)
            return jnp.sum(out * cot)

        g_pl = np.asarray(jax.grad(loss_pl)(feat))
        g_x = np.asarray(jax.grad(loss_xla)(feat))
        np.testing.assert_allclose(g_pl, g_x, rtol=0,
                                   atol=1e-5 * max(np.abs(g_x).max(), 1e-3))

    def test_fast_mode_grads_close(self, rng):
        """Fast (bf16) backward vs the f32 XLA reference: bf16 rounding flips
        max-over-k winners on near-ties, which moves sparse dW entries between
        slots — compare in norm, not pointwise."""
        args, loss_pl, loss_xla = self._setup_support(rng, exact=False)
        g_pl = jax.grad(loss_pl, argnums=(2,))(*args)
        g_x = jax.grad(loss_xla, argnums=(2,))(*args)
        a, b = np.asarray(g_pl[0]), np.asarray(g_x[0])
        rel_l2 = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel_l2 < 0.08, rel_l2
        cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.995, cos


def test_fused_ragged_n(rng):
    """N not a multiple of the tile: padded rows must not leak into outputs."""
    B, N, K, s, co = 1, 150, 6, 2, 32
    verts = rng.normal(scale=0.2, size=(B, N, 3)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, K)).astype(np.int32)
    d = rng.normal(size=(3, s * co)).astype(np.float32)
    got = np.asarray(hs_surface_fused(jnp.asarray(verts), jnp.asarray(idx),
                                      jnp.asarray(d), s, co, tq=64,
                                      interpret=True))
    assert got.shape == (B, N, co)
    assert np.isfinite(got).all()


def test_support_fused_f32x2_tier(rng):
    """exact='f32x2' (2-term feature splits) must track full-f32 XLA math to
    the ~1.5e-5-relative representation budget — between the exact tier
    (~1e-5-grade overall) and fast bf16 (~4e-3) — while running one fewer MXU
    pass per feature gather."""
    B, N, K, cin, s, co = 2, 200, 10, 32, 3, 64
    feat = rng.normal(size=(B, N, cin)).astype(np.float32)
    verts = rng.normal(scale=0.2, size=(B, N, 3)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, K)).astype(np.int32)
    w = (rng.normal(size=(cin, s * co)) * 0.1).astype(np.float32)
    b = (rng.normal(size=(s * co,)) * 0.1).astype(np.float32)
    d = rng.normal(size=(3, s * co)).astype(np.float32)

    want = np.asarray(_xla_support(jnp.asarray(feat), jnp.asarray(verts),
                                   jnp.asarray(idx), jnp.asarray(w),
                                   jnp.asarray(b), jnp.asarray(d), s, co))
    got = np.asarray(hs_support_fused(jnp.asarray(feat), jnp.asarray(verts),
                                      jnp.asarray(idx), jnp.asarray(w),
                                      jnp.asarray(b), jnp.asarray(d), s, co,
                                      tq=64, exact="f32x2", interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3 * scale)
    # and it must be materially tighter than the fast bf16 tier on the same data
    fast = np.asarray(hs_support_fused(jnp.asarray(feat), jnp.asarray(verts),
                                       jnp.asarray(idx), jnp.asarray(w),
                                       jnp.asarray(b), jnp.asarray(d), s, co,
                                       tq=64, exact=False, interpret=True))
    err_x2 = np.abs(got - want).max()
    err_fast = np.abs(fast - want).max()
    assert err_x2 < err_fast / 5, (err_x2, err_fast)


def test_orl_fused_f32x2_tier(rng):
    from hspose_tpu.ops.pallas_hs_fused import orl_global_fused

    B, N, K, C = 2, 150, 12, 48
    feat = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, K)).astype(np.int32)
    neigh = np.take_along_axis(feat[:, None].repeat(N, 1),
                               idx[..., None].repeat(C, -1), axis=2)
    want = np.max(neigh, axis=2).mean(axis=1, keepdims=True)
    got = np.asarray(orl_global_fused(jnp.asarray(feat), jnp.asarray(idx),
                                      tq=64, exact="f32x2", interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5 * np.abs(want).max())


def test_slot_groupings_bit_identical(rng):
    """The serving path's neighbour-slot group size (slots=1/2/3/4) must not
    change a single bit — same gathers, same reduction tree shape per slot.
    On-chip, groups of 4 measured as a wash vs pairs (probe_slot_group.py):
    the kernels are compute-bound after pairing, so slots=2 stays the default.
    """
    from hspose_tpu.ops.knn import knn_indices
    from hspose_tpu.ops.pallas_hs_fused import (
        hs_support_fused,
        hs_surface_fused,
        orl_global_fused,
    )

    B, N, K, S, co = 2, 96, 20, 7, 32
    verts = jnp.asarray(rng.normal(scale=0.3, size=(B, N, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32))
    idx = knn_indices(verts, K)
    dirs = jnp.asarray(rng.normal(size=(3, S * co)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, S * co)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(S * co,)).astype(np.float32) * 0.1)

    for exact in (True, False, "f32x2"):
        ref = [np.asarray(hs_support_fused(feat, verts, idx, w, b, dirs, S, co,
                                           exact=exact, interpret=True)),
               np.asarray(hs_surface_fused(verts, idx, dirs, S, co,
                                           exact=exact, interpret=True)),
               np.asarray(orl_global_fused(feat, idx, exact=exact,
                                           interpret=True))]
        for g in (1, 3, 4):
            np.testing.assert_array_equal(ref[0], np.asarray(
                hs_support_fused(feat, verts, idx, w, b, dirs, S, co,
                                 exact=exact, interpret=True, slots=g)),
                err_msg=f"support exact={exact} slots={g}")
            np.testing.assert_array_equal(ref[1], np.asarray(
                hs_surface_fused(verts, idx, dirs, S, co, exact=exact,
                                 interpret=True, slots=g)),
                err_msg=f"surface exact={exact} slots={g}")
            np.testing.assert_array_equal(ref[2], np.asarray(
                orl_global_fused(feat, idx, exact=exact, interpret=True,
                                 slots=g)),
                err_msg=f"orl exact={exact} slots={g}")

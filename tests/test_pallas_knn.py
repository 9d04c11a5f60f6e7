import jax.numpy as jnp
import numpy as np

from hspose_tpu.ops.knn import knn_indices
from hspose_tpu.ops.pallas_knn import knn_indices_pallas


def test_matches_xla_exact(rng):
    pts = rng.normal(size=(2, 200, 3)).astype(np.float32)
    want = np.asarray(knn_indices(jnp.asarray(pts), 8))
    got = np.asarray(knn_indices_pallas(jnp.asarray(pts), 8, tq=64, interpret=True))
    assert got.shape == want.shape
    d = ((pts[:, :, None].astype(np.float64) - pts[:, None].astype(np.float64)) ** 2).sum(-1)
    for b in range(2):
        for i in range(0, 200, 7):
            ws, gs = set(want[b, i].tolist()), set(got[b, i].tolist())
            for g, w in zip(sorted(gs - ws), sorted(ws - gs)):
                # disagreements only on numerical near-ties
                assert abs(d[b, i, g] - d[b, i, w]) < 1e-4, (b, i)


def test_high_dim_feature_path(rng):
    feats = rng.normal(size=(2, 130, 32)).astype(np.float32)
    want = np.asarray(knn_indices(jnp.asarray(feats), 6))
    got = np.asarray(knn_indices_pallas(jnp.asarray(feats), 6, tq=64, interpret=True))
    d = ((feats[:, :, None].astype(np.float64) - feats[:, None].astype(np.float64)) ** 2).sum(-1)
    for b in range(2):
        for i in range(0, 130, 11):
            ws, gs = set(want[b, i].tolist()), set(got[b, i].tolist())
            for g, w in zip(sorted(gs - ws), sorted(ws - gs)):
                assert abs(d[b, i, g] - d[b, i, w]) < 1e-3, (b, i)


def test_excludes_self(rng):
    pts = rng.normal(size=(1, 64, 3)).astype(np.float32)
    got = np.asarray(knn_indices_pallas(jnp.asarray(pts), 5, tq=64, interpret=True))
    rows = np.arange(64)[:, None]
    assert not np.any(got[0] == rows)


def test_tmaj_matches_lane_major(rng):
    """The candidate-major extraction must return identical neighbour sets to
    the lane-major kernel, exact and fast, at production point count."""
    pts = rng.normal(size=(2, 1028, 3)).astype(np.float32)
    for fast in (False, True):
        a = np.asarray(knn_indices_pallas(jnp.asarray(pts), 20, interpret=True,
                                          fast=fast, tmaj=False))
        b = np.asarray(knn_indices_pallas(jnp.asarray(pts), 20, interpret=True,
                                          fast=fast, tmaj=True))
        np.testing.assert_array_equal(a, b, err_msg=f"fast={fast}")


def test_extract_modes_identical(rng):
    """All fast-path extraction strategies (mask / thresh / pair) must return
    bit-identical indices — packed keys are unique, so the j-th smallest is
    well-defined.  thresh is the production default (measured ~11% faster
    on-chip: read-only sweeps, no per-pass tile writeback)."""
    pts = rng.normal(scale=0.2, size=(2, 1028, 3)).astype(np.float32)
    outs = [np.asarray(knn_indices_pallas(jnp.asarray(pts), 20, interpret=True,
                                          fast=True, extract=m))
            for m in ("mask", "thresh", "pair")]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_fast_mode_neighbor_overlap(rng):
    """Packed-key fast mode truncates distances to ~2^-12 relative — pin the
    neighbour-set agreement vs exact mode at production size (N=1028, k=20):
    near-total overlap, disagreements only on distance near-ties."""
    pts = rng.normal(scale=0.2, size=(2, 1028, 3)).astype(np.float32)
    exact = np.asarray(knn_indices_pallas(jnp.asarray(pts), 20, interpret=True))
    fast = np.asarray(knn_indices_pallas(jnp.asarray(pts), 20, interpret=True,
                                         fast=True))
    d = ((pts[:, :, None].astype(np.float64)
          - pts[:, None].astype(np.float64)) ** 2).sum(-1)
    total = exact.shape[0] * exact.shape[1]
    mismatched_rows = 0
    for b in range(exact.shape[0]):
        for i in range(exact.shape[1]):
            es, fs = set(exact[b, i].tolist()), set(fast[b, i].tolist())
            if es != fs:
                mismatched_rows += 1
                # any swapped-in neighbour must be a distance near-tie at the
                # packed-key truncation level (2^-12 relative)
                for g, w in zip(sorted(fs - es), sorted(es - fs)):
                    rel = abs(d[b, i, g] - d[b, i, w]) / max(d[b, i, w], 1e-12)
                    assert rel < 2 ** -10, (b, i, rel)
    assert mismatched_rows / total < 0.02, mismatched_rows / total


def test_streamed_matches_flat(rng, monkeypatch):
    """Forcing the streamed path must reproduce the flat kernel bit-for-bit
    (identical per-element distance arithmetic, just blocked)."""
    import hspose_tpu.ops.pallas_knn as pk

    pts = jnp.asarray(rng.normal(size=(2, 500, 3)).astype(np.float32))
    flat = np.asarray(knn_indices_pallas(pts, 10, interpret=True))
    monkeypatch.setattr(pk, "_STREAM_THRESHOLD", 128)
    streamed = np.asarray(pk.knn_indices_pallas(pts, 10, interpret=True, ts=128))
    np.testing.assert_array_equal(flat, streamed)


def test_streamed_large_n(rng):
    """N=4096 routes to the source-streaming kernel (VMEM flat in N); neighbour
    distance multisets must match XLA exactly (index swaps only on exact ties)."""
    for N, D, k in [(4096, 3, 16), (2500, 3, 8)]:
        pts = rng.normal(size=(1, N, D)).astype(np.float32)
        jpts = jnp.asarray(pts)
        want = np.asarray(knn_indices(jpts, k))[0]
        got = np.asarray(knn_indices_pallas(jpts, k, interpret=True))[0]
        d = ((pts[0, :, None].astype(np.float64) - pts[0, None]) ** 2).sum(-1)
        dg = np.sort(np.take_along_axis(d, got, 1), 1)
        dw = np.sort(np.take_along_axis(d, want, 1), 1)
        np.testing.assert_allclose(dg, dw, rtol=0, atol=0)

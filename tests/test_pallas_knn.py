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

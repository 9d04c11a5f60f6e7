import jax
import jax.numpy as jnp
import numpy as np

from hspose_tpu.ops import knn, sampling

import oracles


class TestKNN:
    def test_matches_bruteforce(self, rng):
        pts = rng.normal(size=(2, 64, 3)).astype(np.float32)
        idx = np.asarray(knn.knn_indices(jnp.array(pts), 8))
        for b in range(2):
            want = oracles.knn_single(pts[b].astype(np.float64), 8)
            d = ((pts[b].astype(np.float64)[:, None] - pts[b][None]) ** 2).sum(-1)
            for i in range(64):
                got_set, want_set = set(idx[b, i].tolist()), set(want[i].tolist())
                # near-ties at the k-boundary may swap under the f32 ‖a‖²+‖b‖²−2ab
                # expansion; any disagreement must be between near-equal distances
                for g, w in zip(sorted(got_set - want_set), sorted(want_set - got_set)):
                    assert abs(d[i, g] - d[i, w]) < 1e-4 * max(d[i, g], 1.0), (b, i)

    def test_excludes_self(self, rng):
        pts = rng.normal(size=(1, 32, 3)).astype(np.float32)
        idx = np.asarray(knn.knn_indices(jnp.array(pts), 5))
        rows = np.arange(32)[:, None]
        assert not np.any(idx[0] == rows)

    def test_nearest_index(self, rng):
        tgt = rng.normal(size=(2, 40, 3)).astype(np.float32)
        src = rng.normal(size=(2, 10, 3)).astype(np.float32)
        got = np.asarray(knn.nearest_index(jnp.array(tgt), jnp.array(src)))
        d = ((tgt[:, :, None] - src[:, None]) ** 2).sum(-1)
        want = d.argmin(-1)
        np.testing.assert_array_equal(got, want)

    def test_gather_neighbors(self, rng):
        feats = rng.normal(size=(2, 16, 5)).astype(np.float32)
        idx = rng.integers(0, 16, size=(2, 16, 3))
        got = np.asarray(knn.gather_neighbors(jnp.array(feats), jnp.array(idx)))
        for b in range(2):
            for i in range(16):
                for k in range(3):
                    np.testing.assert_array_equal(got[b, i, k], feats[b, idx[b, i, k]])

    def test_neighbor_directions_are_unit(self, rng):
        pts = rng.normal(size=(1, 32, 3)).astype(np.float32)
        idx = knn.knn_indices(jnp.array(pts), 4)
        dirs = np.asarray(knn.neighbor_directions_normalized(jnp.array(pts), idx))
        norms = np.linalg.norm(dirs, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestSampling:
    def test_pool_subsample_is_permutation_prefix(self):
        idx = np.asarray(sampling.pool_subsample_indices(jax.random.key(0), 100, 25))
        assert idx.shape == (25,)
        assert len(set(idx.tolist())) == 25
        assert idx.min() >= 0 and idx.max() < 100

    def test_sample_points_downsample(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        valid = np.ones(200, bool)
        out = np.asarray(sampling.sample_points_fixed(jax.random.key(1), jnp.array(pts),
                                                      jnp.array(valid), 64))
        assert out.shape == (64, 3)
        # every output point is one of the inputs
        d = ((out[:, None] - pts[None]) ** 2).sum(-1).min(1)
        np.testing.assert_allclose(d, 0.0, atol=1e-12)

    def test_sample_points_upsample_tiles_valid(self, rng):
        pts = np.zeros((100, 3), dtype=np.float32)
        pts[:10] = rng.normal(size=(10, 3))
        valid = np.zeros(100, bool)
        valid[:10] = True
        out = np.asarray(sampling.sample_points_fixed(jax.random.key(2), jnp.array(pts),
                                                      jnp.array(valid), 32))
        assert out.shape == (32, 3)
        d = ((out[:, None] - pts[None, :10]) ** 2).sum(-1).min(1)
        np.testing.assert_allclose(d, 0.0, atol=1e-12)
        # all 10 valid points appear (tiling semantics)
        d2 = ((pts[:10, None] - out[None]) ** 2).sum(-1).min(1)
        np.testing.assert_allclose(d2, 0.0, atol=1e-12)

    def test_ignores_invalid(self, rng):
        pts = np.full((50, 3), 77.0, dtype=np.float32)
        pts[:30] = rng.normal(size=(30, 3))
        valid = np.zeros(50, bool)
        valid[:30] = True
        out = np.asarray(sampling.sample_points_fixed(jax.random.key(3), jnp.array(pts),
                                                      jnp.array(valid), 20))
        assert not np.any(np.all(out == 77.0, axis=-1))

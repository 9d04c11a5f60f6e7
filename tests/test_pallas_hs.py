"""The fused HS support-reduction kernels must match the lax.scan reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from hspose_tpu.ops.pallas_hs import hs_support_reduce, hs_surface_reduce


def _scan_reference(gathered, rf_norm, weights, bias, dirs, s, co):
    acc = np.zeros(gathered.shape[:2] + (co,), np.float32)
    for j in range(s):
        w = weights[:, j * co:(j + 1) * co]
        d = dirs[:, j * co:(j + 1) * co]
        proj = gathered @ w + bias[j * co:(j + 1) * co]
        theta = np.maximum(rf_norm @ d, 0.0)
        acc += (theta * proj).max(axis=2)
    return acc / s


def test_support_reduce_matches_reference(rng):
    B, N, K, Cin, S, Co = 2, 100, 6, 32, 3, 16
    gathered = rng.normal(size=(B, N, K, Cin)).astype(np.float32)
    rf = rng.normal(size=(B, N, K, 3)).astype(np.float32)
    rf /= np.linalg.norm(rf, axis=-1, keepdims=True)
    w = rng.normal(scale=0.2, size=(Cin, S * Co)).astype(np.float32)
    b = rng.normal(scale=0.1, size=(S * Co,)).astype(np.float32)
    d = rng.normal(size=(3, S * Co)).astype(np.float32)

    want = _scan_reference(gathered, rf, w, b, d, S, Co)
    got = np.asarray(hs_support_reduce(jnp.asarray(gathered), jnp.asarray(rf),
                                       jnp.asarray(w), jnp.asarray(b),
                                       jnp.asarray(d), S, Co, tq=64,
                                       interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_surface_reduce_matches_reference(rng):
    B, N, K, S, Co = 2, 70, 5, 4, 8
    rf = rng.normal(size=(B, N, K, 3)).astype(np.float32)
    rf /= np.linalg.norm(rf, axis=-1, keepdims=True)
    d = rng.normal(size=(3, S * Co)).astype(np.float32)

    acc = np.zeros((B, N, Co), np.float32)
    for j in range(S):
        theta = np.maximum(rf @ d[:, j * Co:(j + 1) * Co], 0.0)
        acc += theta.max(axis=2)
    want = acc / S

    got = np.asarray(hs_surface_reduce(jnp.asarray(rf), jnp.asarray(d), S, Co,
                                       tq=64, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_padding_rows_are_ignored(rng):
    """N not a multiple of tq: padded rows must not affect valid outputs."""
    B, N, K, S, Co = 1, 50, 4, 2, 8
    rf = rng.normal(size=(B, N, K, 3)).astype(np.float32)
    d = rng.normal(size=(3, S * Co)).astype(np.float32)
    a = np.asarray(hs_surface_reduce(jnp.asarray(rf), jnp.asarray(d), S, Co, tq=32,
                                     interpret=True))
    b = np.asarray(hs_surface_reduce(jnp.asarray(rf), jnp.asarray(d), S, Co, tq=64,
                                     interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-6)

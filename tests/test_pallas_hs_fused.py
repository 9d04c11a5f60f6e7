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

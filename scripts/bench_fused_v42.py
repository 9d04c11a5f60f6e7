"""Bench the differentiable v4 fused kernels on the real chip.

Times forward and forward+backward of hs_support_fused / hs_surface_fused /
orl_global_fused at the production layer sizes, exact and fast modes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import hspose_tpu  # noqa: F401

from hspose_tpu.ops.pallas_hs_fused import (
    hs_support_fused,
    hs_surface_fused,
    orl_global_fused,
)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:54s} {dt:8.2f} ms", flush=True)
    return dt


def bench_layer(B, N, K, cin, co, s, exact, with_grad):
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(B, N, cin)).astype(np.float32))
    verts = jnp.asarray(rng.normal(scale=0.2, size=(B, N, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
    w = jnp.asarray((rng.normal(size=(cin, s * co)) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(s * co,)) * 0.1).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(3, s * co)).astype(np.float32))
    tag = f"support B{B} N{N} K{K} {cin}->{co} exact={exact}"

    if not with_grad:
        fm = feat.astype(jnp.bfloat16) if not exact else feat

        @jax.jit
        def f(feat, verts, idx, w, b, d):
            return hs_support_fused(feat, verts, idx, w, b, d, s, co, exact=exact)

        timeit("fwd " + tag, f, fm, verts, idx, w, b, d)
    else:
        @jax.jit
        def g(feat, verts, idx, w, b, d):
            def loss(feat, w, b, d):
                return jnp.sum(hs_support_fused(feat, verts, idx, w, b, d, s, co,
                                                exact=exact))
            return jax.grad(loss, argnums=(0, 1, 2, 3))(feat, w, b, d)

        timeit("fwd+bwd " + tag, g, feat, verts, idx, w, b, d)


def bench_surface(B, N, K, co, s, exact, with_grad):
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(scale=0.2, size=(B, N, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
    d = jnp.asarray(rng.normal(size=(3, s * co)).astype(np.float32))
    tag = f"surface B{B} N{N} K{K} co{co} exact={exact}"
    if not with_grad:
        @jax.jit
        def f(verts, idx, d):
            return hs_surface_fused(verts, idx, d, s, co, exact=exact)

        timeit("fwd " + tag, f, verts, idx, d)
    else:
        @jax.jit
        def g(verts, idx, d):
            def loss(verts, d):
                return jnp.sum(hs_surface_fused(verts, idx, d, s, co, exact=exact))
            return jax.grad(loss, argnums=(0, 1))(verts, d)

        timeit("fwd+bwd " + tag, g, verts, idx, d)


def bench_orl(B, N, K, C, exact, with_grad):
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))
    tag = f"orl B{B} N{N} K{K} C{C} exact={exact}"
    if not with_grad:
        fm = feat.astype(jnp.bfloat16) if not exact else feat

        @jax.jit
        def f(feat, idx):
            return orl_global_fused(feat, idx, exact=exact)

        timeit("fwd " + tag, f, fm, idx)
    else:
        @jax.jit
        def g(feat, idx):
            def loss(feat):
                return jnp.sum(orl_global_fused(feat, idx, exact=exact))
            return jax.grad(loss)(feat)

        timeit("fwd+bwd " + tag, g, feat, idx)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    s = 7
    if which == "rest":
        bench_layer(16, 64, 8, 256, 512, s, True, True)
        bench_orl(16, 1028, 20, 128, True, True)
        bench_orl(16, 257, 20, 256, True, True)
        return
    if which in ("all", "train"):
        # training sizes (B=16)
        print("== training sizes (B=16), exact, fwd+bwd ==", flush=True)
        bench_surface(16, 1028, 20, 128, s, True, True)
        bench_layer(16, 1028, 20, 128, 128, s, True, True)
        bench_layer(16, 257, 20, 128, 256, s, True, True)
        bench_layer(16, 257, 20, 256, 256, s, True, True)
        bench_layer(16, 64, 8, 256, 512, s, True, True)
        bench_orl(16, 1028, 20, 128, True, True)
        bench_orl(16, 257, 20, 256, True, True)
    if which in ("all", "serve"):
        print("== serving sizes (B=256), fwd only ==", flush=True)
        for exact in (False, True):
            bench_surface(256, 1028, 20, 128, s, exact, False)
            bench_layer(256, 1028, 20, 128, 128, s, exact, False)
            bench_layer(256, 257, 20, 128, 256, s, exact, False)
            bench_layer(256, 257, 20, 256, 256, s, exact, False)
            bench_layer(256, 64, 8, 256, 512, s, exact, False)
            bench_orl(256, 1028, 20, 128, exact, False)
            bench_orl(256, 257, 20, 256, exact, False)


if __name__ == "__main__":
    main()

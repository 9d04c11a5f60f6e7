"""Probe: neighbour-slot group size in the v4 serving kernels (real TPU).

Slot pairing (groups of 2) bought ~3% in round 3 by halving the number of
one-hot MXU passes (the kernels are pass-bound: the resident source block
streams through the MXU weight registers once per pass).  Groups of 4 halve
the pass count again; the cost is 4× the per-pass VMEM temporaries, which can
force smaller query tiles.  Measures the production layer shapes in fast and
exact mode for slots ∈ {2, 4}; correctness (bit-equality across groupings) is
pinned in interpret mode in tests/test_pallas_hs_fused.py.
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


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:58s} {best * 1000:8.2f} ms", flush=True)
    return best


def main():
    r = np.random.default_rng(0)
    B, S = 256, 7
    # production layers: (N, K, cin, co)
    layers = [(1028, 20, 128, 128), (1028, 20, 128, 256), (257, 20, 256, 256),
              (257, 20, 256, 512)]
    for exact in (False, True):
        dt = jnp.float32 if exact else jnp.bfloat16
        for N, K, cin, co in layers:
            feat = jnp.asarray(r.normal(size=(B, N, cin)).astype(np.float32)).astype(dt)
            verts = jnp.asarray(r.normal(scale=0.2, size=(B, N, 3)).astype(np.float32))
            idx = jnp.asarray(r.integers(0, N, (B, N, K)).astype(np.int32))
            w = jnp.asarray((r.normal(size=(cin, S * co)) * 0.1).astype(np.float32))
            b = jnp.asarray((r.normal(size=(S * co,)) * 0.1).astype(np.float32))
            d = jnp.asarray(r.normal(size=(3, S * co)).astype(np.float32))
            for g in (2, 4):
                fn = jax.jit(lambda f, v, i, w_, b_, d_, gg=g: hs_support_fused(
                    f, v, i, w_, b_, d_, S, co, exact=exact, slots=gg))
                timeit(f"support N{N} {cin}->{co} exact={exact} slots={g}",
                       fn, feat, verts, idx, w, b, d)
        # surface (co=128 at N=1028) + ORL (C=128/256)
        verts = jnp.asarray(r.normal(scale=0.2, size=(B, 1028, 3)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, 1028, (B, 1028, 20)).astype(np.int32))
        d = jnp.asarray(r.normal(size=(3, S * 128)).astype(np.float32))
        for g in (2, 4):
            fn = jax.jit(lambda v, i, d_, gg=g: hs_surface_fused(
                v, i, d_, S, 128, exact=exact, slots=gg))
            timeit(f"surface N1028 co=128 exact={exact} slots={g}", fn, verts,
                   idx, d)
        for C in (128, 256):
            feat = jnp.asarray(r.normal(size=(B, 1028, C)).astype(np.float32)).astype(dt)
            for g in (2, 4):
                fn = jax.jit(lambda f, i, gg=g: orl_global_fused(
                    f, i, exact=exact, slots=gg))
                timeit(f"orl N1028 C{C} exact={exact} slots={g}", fn, feat, idx)


if __name__ == "__main__":
    main()

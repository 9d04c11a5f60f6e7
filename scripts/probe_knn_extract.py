"""Probe: KNN extraction below the iterative floor? (real TPU)

The fast packed-key extraction is the one remaining VPU-bound op
(docs/PERFORMANCE.md): 21 sequential sweeps over the (Npad, TQ) key tile,
each sweep a min-tree + a masked writeback of the full tile.  Two candidate
improvements, both exact-equivalent (packed keys are unique):

* thresh — chain sweeps through the last extracted key instead of masking:
  the tile is never mutated, so each sweep is read-only (no VMEM writeback).
* pair — two smallest per sweep via an elementwise (m1, m2) running-pair
  fold + threshold chaining: halves the number of tile sweeps for ~4 ops per
  element per fold instead of 1.

Measures the production shapes (serve batch 256: xyz KNN at N=1028 D=3 and
the feature KNN at D=128), prints ms per mode.  Correctness of all modes is
asserted in tests/test_sequence_parallel.py-adjacent interpret tests and
cross-checked here on-chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import hspose_tpu  # noqa: F401
from hspose_tpu.ops.pallas_knn import knn_indices_pallas


def _sync(x):
    np.asarray(jnp.ravel(x)[:1])


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):  # best-of-3 windows: tunnel dispatch jitter
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:44s} {best * 1000:8.2f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    B, N, K = 256, 1028, 20
    pts = jnp.asarray(rng.normal(scale=0.2, size=(B, N, 3)), jnp.bfloat16)
    feats = jnp.asarray(rng.normal(size=(B, N, 128)), jnp.bfloat16)

    ref = None
    for mode in ("mask", "thresh", "pair"):
        fn = jax.jit(lambda p, m=mode: knn_indices_pallas(
            p, K, fast=True, extract=m))
        out = np.asarray(fn(pts))
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(ref, out, err_msg=mode)
        timeit(f"xyz KNN (B=256,N=1028,k=20) extract={mode}", fn, pts)

    ref = None
    for mode in ("mask", "thresh", "pair"):
        fn = jax.jit(lambda p, m=mode: knn_indices_pallas(
            p, K, fast=True, extract=m))
        out = np.asarray(fn(feats))
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(ref, out, err_msg=mode)
        timeit(f"feat KNN (B=256,N=1028,D=128) extract={mode}", fn, feats)


if __name__ == "__main__":
    main()

"""Micro-benchmarks of the hot ops on the real chip (run without JAX_PLATFORMS)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import hspose_tpu  # noqa: F401  (sets matmul precision)
from hspose_tpu.ops.knn import gather_neighbors, knn_indices, pairwise_sq_dist


def _sync(out):
    # the tunneled axon backend does not await in block_until_ready; force a fetch
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "addressable_data")]
    if leaves:
        np.asarray(jnp.ravel(leaves[0])[:1])


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1000:8.2f} ms")
    return dt


def main():
    B, N, K, C = 256, 1028, 20, 128
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)

    dist = jax.jit(pairwise_sq_dist)
    timeit("pairwise_sq_dist (B,N,N)", dist, pts, pts)

    knn = jax.jit(lambda p: knn_indices(p, 20))
    timeit("knn_indices k=20", knn, pts)

    @jax.jit
    def topk_only(d):
        return jax.lax.top_k(-d, 21)[1]

    d = dist(pts, pts)
    timeit("top_k(21) on (B,N,N)", topk_only, d)

    gather = jax.jit(gather_neighbors)
    timeit("gather (B,N,K,128)", gather, feats, idx)

    @jax.jit
    def gather_onehot(feats, idx):
        # one-hot matmul alternative to gather
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)  # (B, N, K, N)
        return jnp.einsum("bnkm,bmc->bnkc", oh, feats.astype(jnp.bfloat16),
                          precision=jax.lax.Precision.DEFAULT)

    timeit("gather via one-hot matmul", gather_onehot, feats, idx)

    @jax.jit
    def feat_knn(f):
        return knn_indices(f, 20)

    timeit("knn on features (B,N,128)", feat_knn, feats)

    # full eval forward for reference
    from hspose_tpu.config import default_config
    from hspose_tpu.models.hspose import build_model, eval_forward

    cfg = default_config()
    model = build_model(cfg)
    variables = model.init({"params": jax.random.key(0), "pool": jax.random.key(1),
                            "dropout": jax.random.key(2)}, pts[:2], jnp.zeros((2,), jnp.int32), True)
    params, stats = variables["params"], variables["batch_stats"]
    obj = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def fwd(pc):
        return eval_forward(model, params, stats, jax.random.key(3), pc, obj)

    dt = timeit("full eval forward (B=256)", fwd, pts, iters=5)
    print(f"=> {B/dt:.0f} crops/s")


if __name__ == "__main__":
    main()

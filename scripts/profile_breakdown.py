"""Where does the eval forward's time go?  Block-level breakdown on the real chip.

Times: full forward / backbone (FaceRecon) alone / the three pose heads alone, the
heads at bf16, and the per-resolution KNN + HS kernels at production sizes.
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

import hspose_tpu  # noqa: F401  (sets matmul precision)


def _sync(out):
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "addressable_data")]
    if leaves:
        np.asarray(jnp.ravel(leaves[0])[:1])


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:48s} {dt*1000:8.2f} ms", flush=True)
    return dt


def main():
    from hspose_tpu.config import default_config
    from hspose_tpu.models.hspose import build_model, eval_forward

    B, N = 256, 1028
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(scale=0.2, size=(B, N, 3)), jnp.float32)
    obj = jnp.zeros((B,), jnp.int32)

    cfg = default_config()
    model = build_model(cfg)
    variables = model.init({"params": jax.random.key(0), "pool": jax.random.key(1),
                            "dropout": jax.random.key(2)}, pts[:2], obj[:2], True)
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def fwd(pc):
        return eval_forward(model, params, stats, jax.random.key(3), pc, obj)

    t_full = timeit("full eval forward", fwd, pts, iters=10)
    print(f"=> {B/t_full:.0f} crops/s", flush=True)

    # ---- backbone alone -------------------------------------------------------
    from hspose_tpu.models.face_recon import FaceRecon

    fr = FaceRecon(cfg.model)
    fr_params = params["face_recon"]
    fr_stats = stats["face_recon"]

    @jax.jit
    def backbone(pc):
        c = pc - jnp.mean(pc, axis=1, keepdims=True)
        return fr.apply({"params": fr_params, "batch_stats": fr_stats}, c, obj, False,
                        rngs={"pool": jax.random.key(3)})[2]

    t_bb = timeit("backbone (FaceRecon feat)", backbone, pts, iters=10)
    feat = backbone(pts)
    _sync(feat)

    # ---- heads alone ----------------------------------------------------------
    from hspose_tpu.models.heads import PoseTsHead, RotationHead

    rg = RotationHead()
    ts_head = PoseTsHead()

    @jax.jit
    def heads(feat, pc):
        c = pc - jnp.mean(pc, axis=1, keepdims=True)
        g = rg.apply({"params": params["rot_green"], "batch_stats": stats["rot_green"]},
                     feat, False)
        r = rg.apply({"params": params["rot_red"], "batch_stats": stats["rot_red"]},
                     feat, False)
        t, s = ts_head.apply({"params": params["ts"], "batch_stats": stats["ts"]},
                             jnp.concatenate([feat, c], axis=-1), False)
        return g, r, t, s

    timeit("3 pose heads (f32/high)", heads, feat, pts, iters=10)

    @jax.jit
    def heads_bf16(feat, pc):
        with jax.default_matmul_precision("default"):
            c = pc - jnp.mean(pc, axis=1, keepdims=True)
            f16 = feat.astype(jnp.bfloat16)
            g = rg.apply({"params": params["rot_green"], "batch_stats": stats["rot_green"]},
                         f16, False)
            r = rg.apply({"params": params["rot_red"], "batch_stats": stats["rot_red"]},
                         f16, False)
            t, s = ts_head.apply({"params": params["ts"], "batch_stats": stats["ts"]},
                                 jnp.concatenate([f16, c.astype(jnp.bfloat16)], axis=-1),
                                 False)
        return g, r, t, s

    timeit("3 pose heads (bf16 in, default prec)", heads_bf16, feat, pts, iters=10)

    # ---- hot primitives at production sizes ------------------------------------
    from hspose_tpu.ops.knn import gather_neighbors
    from hspose_tpu.ops.pallas_knn import knn_indices_pallas
    from hspose_tpu.ops.pallas_hs import hs_support_reduce, hs_surface_reduce

    feats128 = jnp.asarray(rng.normal(size=(B, N, 128)), jnp.float32)
    idx20 = jnp.asarray(rng.integers(0, N, (B, N, 20)), jnp.int32)

    timeit("pallas knn pts k=20 (N=1028,D=3)", lambda p: knn_indices_pallas(p, 20), pts)
    timeit("pallas knn feat k=20 (N=1028,D=128)",
           lambda f: knn_indices_pallas(f, 20), feats128)
    timeit("pallas knn pts k=4 (N=1028)", lambda p: knn_indices_pallas(p, 4), pts)

    timeit("gather (B,1028,20,128) one-hot HIGHEST", jax.jit(gather_neighbors),
           feats128, idx20)

    @jax.jit
    def gather_bf16(f, i):
        oh = jax.nn.one_hot(i, N, dtype=jnp.bfloat16)
        return jnp.einsum("bnkm,bmc->bnkc", oh, f.astype(jnp.bfloat16),
                          precision=jax.lax.Precision.DEFAULT)

    timeit("gather (B,1028,20,128) one-hot bf16", gather_bf16, feats128, idx20)

    rf_norm = jnp.asarray(rng.normal(size=(B, N, 20, 3)), jnp.float32)
    rf_norm /= jnp.linalg.norm(rf_norm, axis=-1, keepdims=True)
    gathered = jnp.asarray(rng.normal(size=(B, N, 20, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 7 * 128)), jnp.float32) * 0.05
    b = jnp.asarray(rng.normal(size=(7 * 128,)), jnp.float32) * 0.05
    dirs = jnp.asarray(rng.normal(size=(3, 7 * 128)), jnp.float32)

    timeit("hs_surface_reduce (N=1028,S=7,C=128)",
           lambda r, d: hs_surface_reduce(r, d, 7, 128), rf_norm, dirs)
    timeit("hs_support_reduce exact (N=1028,Cin=128)",
           lambda g, r: hs_support_reduce(g, r, w, b, dirs, 7, 128), gathered, rf_norm)
    timeit("hs_support_reduce bf16 (exact=False)",
           lambda g, r: hs_support_reduce(g, r, w, b, dirs, 7, 128, exact=False),
           gathered, rf_norm)

    # ORL branch at production size: gather + max + mean
    @jax.jit
    def orl(f, i):
        neigh = gather_neighbors(f, i)
        return jnp.mean(jnp.max(neigh, axis=2), axis=1, keepdims=True)

    timeit("ORL gather+max+mean (B,1028,20,128)", orl, feats128, idx20)


if __name__ == "__main__":
    main()

"""Measure the v2 (k-major) HS kernels + full forward on the real chip."""

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
from hspose_tpu.ops.pallas_hs import hs_support_reduce, hs_surface_reduce


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
    print(f"{name:52s} {dt*1000:8.2f} ms", flush=True)
    return dt


def main():
    B, N, K = 256, 1028, 20
    rng = np.random.default_rng(0)
    rf_km = jnp.asarray(rng.normal(size=(B, K, N, 3)), jnp.float32)
    rf_km /= jnp.linalg.norm(rf_km, axis=-1, keepdims=True)
    g_km = jnp.asarray(rng.normal(size=(B, K, N, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 7 * 128)), jnp.float32) * 0.05
    b = jnp.asarray(rng.normal(size=(7 * 128,)), jnp.float32) * 0.05
    dirs = jnp.asarray(rng.normal(size=(3, 7 * 128)), jnp.float32)

    timeit("v2 hs_surface_reduce exact (N=1028,S=7,C=128)",
           lambda r, d: hs_surface_reduce(r, d, 7, 128, kmajor=True), rf_km, dirs)
    timeit("v2 hs_support_reduce exact (N=1028,Cin=128)",
           lambda g, r: hs_support_reduce(g, r, w, b, dirs, 7, 128, kmajor=True),
           g_km, rf_km)
    timeit("v2 hs_support_reduce fast (exact=False)",
           lambda g, r: hs_support_reduce(g, r, w, b, dirs, 7, 128, kmajor=True,
                                          exact=False), g_km, rf_km)
    timeit("v2 hs_surface_reduce fast",
           lambda r, d: hs_surface_reduce(r, d, 7, 128, kmajor=True, exact=False),
           rf_km, dirs)

    # bf16 inputs (fast mode end-to-end)
    g16 = g_km.astype(jnp.bfloat16)
    rf16 = rf_km.astype(jnp.bfloat16)
    timeit("v2 hs_support_reduce fast bf16-in",
           lambda g, r: hs_support_reduce(g, r, w, b, dirs, 7, 128, kmajor=True,
                                          exact=False), g16, rf16)

    # sanity vs v1 semantics (XLA reference on-chip)
    def xla_ref(g, r):
        acc = jnp.zeros((g.shape[0], N, 128), jnp.float32)
        for j in range(7):
            ws = w[:, j * 128:(j + 1) * 128]
            ds = dirs[:, j * 128:(j + 1) * 128]
            proj = jnp.einsum("bknc,cd->bknd", g, ws,
                              precision=jax.lax.Precision.HIGHEST) + b[j * 128:(j + 1) * 128]
            theta = jax.nn.relu(jnp.einsum("bknc,cd->bknd", r, ds,
                                           precision=jax.lax.Precision.HIGHEST))
            acc = acc + jnp.max(theta * proj, axis=1)
        return acc / 7

    want = jax.jit(xla_ref)(g_km[:2], rf_km[:2])
    got = hs_support_reduce(g_km[:2], rf_km[:2], w, b, dirs, 7, 128, kmajor=True)
    err = float(jnp.max(jnp.abs(want - got)) / jnp.max(jnp.abs(want)))
    print(f"support exact rel err vs XLA HIGHEST: {err:.2e}", flush=True)

    got_f = hs_support_reduce(g_km[:2], rf_km[:2], w, b, dirs, 7, 128, kmajor=True,
                              exact=False)
    err_f = float(jnp.max(jnp.abs(want - got_f)) / jnp.max(jnp.abs(want)))
    print(f"support fast  rel err vs XLA HIGHEST: {err_f:.2e}", flush=True)

    # full forward with the new kernels
    from hspose_tpu.config import default_config
    from hspose_tpu.models.hspose import build_model, eval_forward

    cfg = default_config()
    model = build_model(cfg)
    pts = jnp.asarray(rng.normal(scale=0.2, size=(B, N, 3)), jnp.float32)
    obj = jnp.zeros((B,), jnp.int32)
    variables = model.init({"params": jax.random.key(0), "pool": jax.random.key(1),
                            "dropout": jax.random.key(2)}, pts[:2], obj[:2], True)
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def fwd(pc):
        return eval_forward(model, params, stats, jax.random.key(3), pc, obj)

    dt = timeit("full eval forward (v2 kernels)", fwd, pts, iters=10)
    print(f"=> {B/dt:.0f} crops/s", flush=True)


if __name__ == "__main__":
    main()

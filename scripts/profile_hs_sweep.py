"""Sweep HS kernel variants (theta impl × precision × tq) on the real chip."""

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
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jnp.ravel(leaves[0])[:1])


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:58s} {dt*1000:8.2f} ms", flush=True)
    return dt


def main():
    B, N, K = 256, 1028, 20
    rng = np.random.default_rng(0)
    rf_km = jnp.asarray(rng.normal(size=(B, K, N, 3)), jnp.float32)
    rf_km /= jnp.linalg.norm(rf_km, axis=-1, keepdims=True)
    g_km = jnp.asarray(rng.normal(size=(B, K, N, 128)), jnp.float32)
    g16 = g_km.astype(jnp.bfloat16)
    rf16 = rf_km.astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(128, 7 * 128)), jnp.float32) * 0.05
    b = jnp.asarray(rng.normal(size=(7 * 128,)), jnp.float32) * 0.05
    dirs = jnp.asarray(rng.normal(size=(3, 7 * 128)), jnp.float32)

    for tq in (64, 128):
        for mxu in (False, True):
            timeit(f"surface exact tq={tq} theta_mxu={mxu}",
                   lambda r, d, tq=tq, mxu=mxu: hs_surface_reduce(
                       r, d, 7, 128, tq=tq, kmajor=True, theta_mxu=mxu),
                   rf_km, dirs)
    for tq in (64, 128):
        timeit(f"surface fast  tq={tq} theta_mxu=True bf16-in",
               lambda r, d, tq=tq: hs_surface_reduce(
                   r, d, 7, 128, tq=tq, kmajor=True, exact=False), rf16, dirs)

    for tq in (32, 64, 128):
        for mxu in (False, True):
            timeit(f"support exact tq={tq} theta_mxu={mxu}",
                   lambda g, r, tq=tq, mxu=mxu: hs_support_reduce(
                       g, r, w, b, dirs, 7, 128, tq=tq, kmajor=True,
                       theta_mxu=mxu), g_km, rf_km)
    for tq in (32, 64, 128):
        timeit(f"support fast  tq={tq} theta_mxu=True bf16-in",
               lambda g, r, tq=tq: hs_support_reduce(
                   g, r, w, b, dirs, 7, 128, tq=tq, kmajor=True, exact=False),
               g16, rf16)

    # backward kernel at production size (training path)
    cot = jnp.asarray(rng.normal(size=(B, N, 128)), jnp.float32)

    def train_loss(g, r, w, b, d):
        return jnp.sum(hs_support_reduce(g, r, w, b, d, 7, 128, kmajor=True) * cot)

    grad_fn = jax.jit(jax.grad(train_loss, argnums=(0, 2, 3, 4)))
    timeit("support fwd+bwd (custom VJP, exact)", grad_fn, g_km, rf_km, w, b, dirs,
           iters=5)


if __name__ == "__main__":
    main()

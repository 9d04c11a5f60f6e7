"""Microbenchmark: int8 vs bf16 MXU matmul throughput inside Pallas on v5e."""
import sys, time, functools
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

def mm_kernel(a_ref, b_ref, o_ref, *, reps, out_dtype):
    a = a_ref[0]
    b = b_ref[0]
    acc = jnp.zeros((a.shape[0], b.shape[1]), out_dtype)
    for _ in range(reps):
        acc += jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=out_dtype)
    o_ref[0] = acc

def run(dtype, out_dtype, M=256, K=1024, N=256, reps=32, G=64, iters=20):
    r = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(r.integers(-127, 127, (G, M, K)).astype(np.int8))
        b = jnp.asarray(r.integers(-127, 127, (G, K, N)).astype(np.int8))
    else:
        a = jnp.asarray(r.normal(size=(G, M, K)).astype(np.float32)).astype(dtype)
        b = jnp.asarray(r.normal(size=(G, K, N)).astype(np.float32)).astype(dtype)
    f = pl.pallas_call(
        functools.partial(mm_kernel, reps=reps, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((G, M, N), out_dtype),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, M, K), lambda g: (g, 0, 0)),
                  pl.BlockSpec((1, K, N), lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((1, M, N), lambda g: (g, 0, 0)))
    f = jax.jit(f)
    out = f(a, b); np.asarray(out[0, :1, :1])
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(a, b)
        np.asarray(out[0, :1, :1])
        best = min(best, (time.perf_counter() - t0) / iters)
    tops = 2 * M * K * N * reps * G / best / 1e12
    print(f"{np.dtype(dtype).name:9s}->{np.dtype(out_dtype).name:8s} {best*1000:7.2f} ms  {tops:6.1f} T(FL)OPS", flush=True)

try:
    run(jnp.bfloat16, jnp.float32)
except Exception as e:
    print("bf16 FAILED:", type(e).__name__, str(e)[:200])
try:
    run(jnp.int8, jnp.int32)
except Exception as e:
    print("int8 FAILED:", type(e).__name__, str(e)[:300])

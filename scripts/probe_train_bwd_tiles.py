"""Probe (a) of the round-5 train-step campaign: backward-kernel tile sweep.

The v3 support/surface backward kernels pick their tile via
``_pick_tq_bwd`` (largest multiple-of-8 divisor of n_pad fitting an 8 MB
footprint model).  That model was validated at the round-3 shapes; this probe
measures the ACTUAL backward kernel time across every legal tile at the
bf16 batch-24 training shapes (docs/PERFORMANCE.md batch sweep optimum) and
reports whether the auto-pick is on the measured optimum.

Runs the raw backward pallas_call in isolation (the probe target is kernel
schedule, not the step's op mix), timed by fetch-synchronization.

Usage: python scripts/probe_train_bwd_tiles.py  (TPU, ~2 min)
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

from hspose_tpu.ops import pallas_hs as phs

B = 24  # bf16 training throughput optimum

# (name, N, K, Cin, Co): the four support layers + the surface layer of the
# backbone at train shapes (FaceRecon.py:92-97 neighbour rules)
SUPPORT_SHAPES = [
    ("conv_1 1028/128->128", 1028, 20, 128, 128),
    ("conv_2  257/128->256", 257, 20, 128, 256),
    ("conv_3  257/256->256", 257, 20, 256, 256),
    ("conv_4   64/256->512", 64, 8, 256, 512),
]
S = 7


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # compile + sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / iters * 1000


def legal_bwd_tiles(n_pad, k_pad, cin, co, s_co, cap=None):
    """Every multiple-of-8 divisor of n_pad (the Mosaic constraint) up to the
    forward tile, ignoring the footprint model — the measurement decides."""
    out = []
    for tq in range(8, (cap or n_pad) + 1, 8):
        if n_pad % tq == 0:
            out.append(tq)
    return out


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    print(f"support backward tile sweep  B={B} S={S} dtype=bf16 "
          f"(training fast-bwd config)", flush=True)
    for name, n, k, cin, co in SUPPORT_SHAPES:
        s_co = S * co
        # forward tile exactly as hs_support_reduce picks it
        k_pad = ((k + phs._K_ALIGN - 1) // phs._K_ALIGN) * phs._K_ALIGN
        tq_fwd = phs._pick_tq(128, k_pad, cin, co, s_co)
        n_pad = ((n + tq_fwd - 1) // tq_fwd) * tq_fwd
        g = jnp.asarray(rng.normal(size=(B, k_pad, n_pad, cin)), dt)
        rf = jnp.asarray(rng.normal(size=(B, k_pad, n_pad, 3)), dt)
        w = jnp.asarray(rng.normal(size=(cin, s_co)), jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(1, s_co)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(3, s_co)), jnp.float32)
        win = jnp.asarray(rng.integers(0, k, (B, n_pad, s_co)), jnp.int32)
        gbar = jnp.asarray(rng.normal(size=(B, n_pad, co)), jnp.float32)

        auto = phs._pick_tq_bwd(tq_fwd, n_pad, k_pad, cin, co, s_co)
        rows = []
        orig = phs._pick_tq_bwd
        try:
            for tq in legal_bwd_tiles(n_pad, k_pad, cin, co, s_co, cap=tq_fwd):
                phs._pick_tq_bwd = lambda *a, _tq=tq: _tq

                def run(g, rf, w, b2, d, win, gbar, _tq=tq):
                    return phs._support_pallas_bwd(
                        g, rf, w, b2, d, win, gbar, s=S, co=co, k_valid=k,
                        tq=tq_fwd, exact=False, interpret=False)

                try:
                    ms = time_fn(jax.jit(run), g, rf, w, b2, d, win, gbar)
                    rows.append((tq, ms))
                except Exception as e:  # tile too big for VMEM etc.
                    rows.append((tq, None))
                    print(f"  tq={tq}: FAIL {type(e).__name__}", flush=True)
        finally:
            phs._pick_tq_bwd = orig
        best = min((r for r in rows if r[1] is not None), key=lambda r: r[1])
        print(f"{name}: fwd tq={tq_fwd}  auto bwd tq={auto}", flush=True)
        for tq, ms in rows:
            if ms is None:
                continue
            mark = " <- auto" if tq == auto else ""
            mark += " <- best" if tq == best[0] else ""
            print(f"  tq={tq:4d}: {ms:7.2f} ms{mark}", flush=True)
        auto_ms = dict(r for r in rows if r[1] is not None).get(auto)
        if auto_ms is not None and best[1] is not None:
            print(f"  auto vs best: {auto_ms:.2f} vs {best[1]:.2f} ms "
                  f"({(auto_ms / best[1] - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()

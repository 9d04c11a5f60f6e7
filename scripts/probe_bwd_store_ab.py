"""Interleaved A/B: recompute backward vs stored-winner-values backward.

Session-to-session step timings drift ~2% on the tunneled rig (48.8-51.4 ms
for the IDENTICAL cached base program across three sessions), which swamps a
few-percent effect.  This probe compiles BOTH step functions first, then
times them in interleaved rounds (A B A B ...) and reports per-variant
best/median — drift hits both variants equally inside a round.

Usage: python scripts/probe_bwd_store_ab.py [rounds]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from hspose_tpu.config import default_config
from hspose_tpu.engine.train_step import build_train_step
from hspose_tpu.models.hspose import build_model
from hspose_tpu.utils.synthetic import synthetic_train_batch


def main(rounds=6, iters=20):
    cfg0 = default_config()
    cfg0 = cfg0.replace(model=dataclasses.replace(cfg0.model,
                                                  compute_dtype="bfloat16"))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(24, cfg0.data.num_points).items()}

    runs = {}
    for name, store in [("recompute", False), ("store", True)]:
        cfg = cfg0.replace(model=dataclasses.replace(cfg0.model,
                                                     bwd_store=store))
        model = build_model(cfg)
        _, state, step = build_train_step(cfg, model, jax.random.key(0))
        state, m = step(state, batch, jax.random.key(1))
        np.asarray(m["total_loss"])  # compile + sync
        runs[name] = (state, step, [])

    key = jax.random.key(1)
    for r in range(rounds):
        for name in runs:
            state, step, times = runs[name]
            state, m = step(state, batch, key)  # re-warm after switch
            np.asarray(m["total_loss"])
            t0 = time.time()
            for _ in range(iters):
                state, m = step(state, batch, key)
            np.asarray(m["total_loss"])
            times.append((time.time() - t0) / iters * 1000)
            runs[name] = (state, step, times)

    for name, (_, _, times) in runs.items():
        t = sorted(times)
        print(f"{name:>10s}: best {t[0]:6.2f} | median {t[len(t)//2]:6.2f} | "
              f"all {[f'{x:.2f}' for x in times]}", flush=True)
    tb = {n: sorted(t)[0] for n, (_, _, t) in runs.items()}
    print(f"store vs recompute (best): "
          f"{(tb['store'] / tb['recompute'] - 1) * 100:+.2f}%", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)

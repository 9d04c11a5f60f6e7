"""Round-5 train-step probe runner: full-step timing of kernel-pool variants.

Times the COMPLETE jitted train step (aug + forward + 4 loss families +
Ranger) at the bf16 batch-24 throughput optimum for each candidate variant —
the honest metric for the probe campaign (isolated kernel timings miss
overlap/fusion effects; docs/PERFORMANCE.md serving-batch attribution).

Variants:
  base       — shipping config (v3 kernels, recompute backward)
  bwd_store  — probe (c): forward stores winner theta/proj, backward skips
               both recomputes (model.bwd_store=true)

Usage: python scripts/probe_train_step_variants.py [--batch 24] [--f32]
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


def time_step(cfg, batch, iters=30):
    model = build_model(cfg)
    _, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    key = jax.random.key(1)
    state, m = train_step(state, batch, key)  # compile
    np.asarray(m["total_loss"])
    # re-warm (first post-compile step can carry allocation noise)
    state, m = train_step(state, batch, key)
    np.asarray(m["total_loss"])
    t0 = time.time()
    for _ in range(iters):
        state, m = train_step(state, batch, key)
    np.asarray(m["total_loss"])
    dt = (time.time() - t0) / iters
    return dt * 1000, float(np.asarray(m["total_loss"]))


def main():
    args = sys.argv[1:]
    bs = 24
    if "--batch" in args:
        i = args.index("--batch")
        bs = int(args[i + 1])
    dtype = "float32" if "--f32" in args else "bfloat16"

    cfg0 = default_config()
    cfg0 = cfg0.replace(model=dataclasses.replace(cfg0.model,
                                                  compute_dtype=dtype))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(bs, cfg0.data.num_points).items()}

    variants = [
        ("base", cfg0),
        ("bwd_store", cfg0.replace(model=dataclasses.replace(
            cfg0.model, bwd_store=True))),
        ("v4_small", cfg0.replace(model=dataclasses.replace(
            cfg0.model, train_v4_small=True))),
        ("store+v4", cfg0.replace(model=dataclasses.replace(
            cfg0.model, bwd_store=True, train_v4_small=True))),
    ]
    print(f"train-step variant probe  batch={bs} dtype={dtype}", flush=True)
    base_ms = None
    for name, cfg in variants:
        ms, loss = time_step(cfg, batch)
        if base_ms is None:
            base_ms = ms
        print(f"{name:>10s}: {ms:7.2f} ms/step  ({bs / ms * 1000:6.1f} "
              f"samples/s)  loss {loss:.4f}  "
              f"[{(ms / base_ms - 1) * 100:+.1f}% vs base]", flush=True)


if __name__ == "__main__":
    main()

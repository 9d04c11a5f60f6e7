"""Large-batch training throughput sweep on the real TPU chip.

The reference trains at batch 16 (config/config.py:55-59, engine/train.py:65-69)
because that is what its GPU recipe used; a TPU chip is throughput-optimal at
much larger batches (SURVEY §2.2's batch-256 target).  This sweeps the full
jitted train step (aug + 4 loss families + Ranger) over batch {16, 24, 32,
48, 64, 128, 256} x {float32, bfloat16} and reports ms/step, samples/s, and
train-MFU.

Train-MFU: analytic matmul FLOPs of one *training* sample = 3x the eval
forward work (forward + ~2x backward) plus 3x the train-only recon/face heads
(FaceRecon.py:37-68) which eval does not run, divided by the v5e bf16 peak
(197 TFLOP/s).  Elementwise/VPU loss work not counted (same convention as
bench.py::model_flops_per_crop).

Usage: nohup python -u scripts/train_batch_sweep.py > /tmp/train_sweep.log &
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import V5E_BF16_PEAK_FLOPS, train_flops_per_sample
from hspose_tpu.config import default_config


def make_batch(bs: int, n: int):
    from hspose_tpu.utils.synthetic import synthetic_train_batch
    return jax.tree.map(jnp.asarray, synthetic_train_batch(bs, n))


def sweep_one(cfg, bs: int, iters: int):
    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model

    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=bs))
    model = build_model(cfg)
    tx, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    batch = make_batch(bs, cfg.data.num_points)
    key = jax.random.key(1)
    state, m = train_step(state, batch, key)
    np.asarray(m["total_loss"])  # sync (block_until_ready doesn't await on axon)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = train_step(state, batch, key)
        np.asarray(m["total_loss"])
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    return best


def main():
    cfg_f32 = default_config()
    cfg_bf16 = cfg_f32.replace(model=dataclasses.replace(
        cfg_f32.model, compute_dtype="bfloat16"))
    n = cfg_f32.data.num_points
    fl = train_flops_per_sample(n)
    print(f"train FLOPs/sample (analytic matmul, fwd+bwd): {fl / 1e9:.1f} GFLOP",
          flush=True)

    for name, cfg in (("f32", cfg_f32), ("bf16", cfg_bf16)):
        for bs in (16, 24, 32, 48, 64, 128, 256):
            iters = max(4, min(15, 256 // bs * 4))
            try:
                ms = sweep_one(cfg, bs, iters)
            except Exception as e:  # noqa: BLE001 — OOM etc: record and continue
                print(f"{name} batch {bs}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:200]})", flush=True)
                continue
            sps = bs / ms * 1000
            mfu = sps * fl / V5E_BF16_PEAK_FLOPS
            print(f"{name} batch {bs}: {ms:.1f} ms/step, {sps:.1f} samples/s, "
                  f"train-MFU {mfu:.3f}", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: eval-path pose inference throughput on one TPU chip.

Measures the flagship metric from BASELINE.json — detection-crop pose inference
(eval-mode PoseNet9D forward + generate_RT pose assembly) in crops/second on a
single chip, batch 256, 1028-point clouds, the exact configuration of the batched
REAL275 evaluation harness.

Baseline note: the reference publishes no throughput number (SURVEY.md §6); its
logged per-image inference time on the stated RTX 3090 with ~3 crops/image implies
≈200 crops/s, which we use as the reference point.  BASELINE.json's target is ≥5×
that per v5e chip (≥1000 crops/s).  vs_baseline below is measured / 200.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

ASSUMED_3090_CROPS_PER_SEC = 200.0


def main():
    import jax

    # persistent compile cache: the remote-tunnel TPU compile of the full model is
    # minutes; cache it across bench invocations
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from hspose_tpu.config import default_config
    from hspose_tpu.geometry.rotations import generate_RT
    from hspose_tpu.models.hspose import build_model, eval_forward

    cfg = default_config()
    n = cfg.data.num_points
    B = 256

    model = build_model(cfg)
    rng = np.random.default_rng(0)
    pc_host = rng.normal(scale=0.2, size=(B, n, 3)).astype(np.float32)
    obj_host = (np.arange(B) % 6).astype(np.int32)
    sym_host = np.tile(np.array([[0, 1, 0, 0]], np.float32), (B, 1))

    variables = model.init({"params": jax.random.key(0), "pool": jax.random.key(1),
                            "dropout": jax.random.key(2)},
                           jnp.asarray(pc_host[:2]), jnp.asarray(obj_host[:2]), True)
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    @jax.jit
    def forward(pc, obj_id, sym, key):
        out = eval_forward(model, params, batch_stats, key, pc, obj_id)
        RT = generate_RT(out.p_green_R, out.p_red_R, out.f_green_R, out.f_red_R,
                         out.pred_T, sym)
        return RT, out.pred_s

    pc = jnp.asarray(pc_host)
    obj_id = jnp.asarray(obj_host)
    sym = jnp.asarray(sym_host)
    key = jax.random.key(0)

    # warmup / compile.  NB: block_until_ready does not await completion on the
    # tunneled axon backend — force a host fetch to synchronize.
    RT, s = forward(pc, obj_id, sym, key)
    np.asarray(RT)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        RT, s = forward(pc, obj_id, sym, jax.random.fold_in(key, i))
    np.asarray(RT)
    elapsed = time.perf_counter() - t0

    crops_per_sec = B * iters / elapsed
    print(json.dumps({
        "metric": "pose_inference_throughput",
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / ASSUMED_3090_CROPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

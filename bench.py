"""Benchmark: eval-path pose inference throughput on one TPU chip.

Measures the flagship metric from BASELINE.json — detection-crop pose inference
(eval-mode PoseNet9D forward + generate_RT pose assembly) in crops/second on a
single chip, batch 24, 1028-point clouds, the exact configuration of the batched
REAL275 evaluation harness (``eval.eval_batch``).  Batch 24 is the measured
serving-batch optimum: throughput rises monotonically as the device batch
shrinks (smaller inter-op HBM working sets; the Pallas grid work per crop is
B-independent) down to a knee at B≈24-32, with dispatch overhead biting below
16 — full sweep in scripts/probe_serve_batch.py (B=256, the old bench shape,
is ~5% slower on every tier; the split-gather tiers prefer 24 over 32 after
the round-4 graph slimming).

The headline value is the bf16 fast inference mode
(``model.compute_dtype=bfloat16``): measured deviations vs the f32-exact path
are ≤0.6° on the predicted rotation axes and ≤4e-4 m on translation/size — far
below the 5°/2cm mAP bin widths (parity study in docs/PERFORMANCE.md).  The
JSON line additionally carries ``exact_crops_per_sec`` (the f32-faithful
serving path) and ``train_step_ms`` (full reference-recipe train step).

Baseline note: the reference publishes no throughput number (SURVEY.md §6); its
logged per-image inference time on the stated RTX 3090 with ~3 crops/image implies
≈200 crops/s, which we use as the reference point.  BASELINE.json's target is ≥5×
that per v5e chip (≥1000 crops/s).  vs_baseline below is measured / 200 — the
baseline is inferred, not measured (no GPU in this environment).

Also reports MFU: analytic model FLOPs/crop (matmul work only — one-hot gathers
are rewritten to real gathers by XLA and count as bandwidth, not FLOPs; see
model_flops_per_crop below for the derivation) divided by the v5e bf16 peak
(197 TFLOP/s).  The extra JSON fields ride inside the single line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

ASSUMED_3090_CROPS_PER_SEC = 200.0
V5E_BF16_PEAK_FLOPS = 197e12


def model_flops_per_crop(n: int = 1028, k: int = 20, s: int = 7,
                         obj_c: int = 6) -> float:
    """Analytic matmul FLOPs of one eval crop (documented in
    docs/PERFORMANCE.md §MFU).

    Counted: KNN distance inner products, HS support projections + theta
    contractions, feature_center/STE/conv2 dense maps, 1-NN upsample distances,
    and the three pose heads.  Not counted: one-hot gather einsums (XLA rewrites
    them to gathers — bandwidth, not FLOPs) and elementwise/VPU work.
    """
    n1, n2 = n // 4, n // 16
    k1, k2 = min(k, n1 // 8), min(k, n2 // 8)

    def knn_dist(nn, d):
        return 2 * nn * nn * d

    fl = 0.0
    # KNN distance matmuls per resolution (vert, rf-f, pool / vert, rf2, rf3, pool / vert, rf4)
    fl += knn_dist(n, 3) * 2 + knn_dist(n, 128)          # vert_idx_0, pool_idx_0, rf_1
    fl += knn_dist(n1, 3) * 2 + knn_dist(n1, 128) + knn_dist(n1, 256)
    fl += knn_dist(n2, 3) + knn_dist(n2, 256)
    # 1-NN upsample distances
    fl += 2 * n * n1 * 3 + 2 * n * n2 * 3

    # HS layers: theta (N·K·3·S·C) + projection (N·K·Cin·S·C) + center/STE/conv2
    def hs(nn, kk, cin, co, surface=False):
        f = 2 * nn * kk * 3 * s * co  # theta
        if not surface:
            f += 2 * nn * kk * cin * s * co  # support projection
            f += 2 * nn * cin * co  # feature_center
        f += 2 * nn * cin * co  # STE
        f += 2 * nn * (2 * co) * co  # conv2 on [feat | global]
        return f

    fl += hs(n, k, 3, 128, surface=True)
    fl += hs(n, k, 128, 128)
    fl += hs(n1, k1, 128, 256)
    fl += hs(n1, k1, 256, 256)
    fl += hs(n2, k2, 256, 512)

    # pose heads: 3 × (1286→1024→256 per point, 256→256→out on the pooled vector)
    feat_c = 128 + 128 + 256 + 256 + 512 + obj_c
    for in_c in (feat_c, feat_c, feat_c + 3):
        fl += 2 * n * (in_c * 1024 + 1024 * 256) + 2 * (256 * 256 + 256 * 8)
    return fl


def measure_inference(cfg, B: int = 256, iters: int = 30) -> float:
    """Eval-forward throughput (crops/s) at the given config's compute dtype."""
    import jax
    import jax.numpy as jnp

    from hspose_tpu.geometry.rotations import generate_RT
    from hspose_tpu.models.hspose import build_model, eval_forward

    n = cfg.data.num_points
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

    # best of 3 timed windows: dispatch rides a network tunnel here, and a
    # single window shows ~5% run-to-run jitter from it (1593 vs 1671 across
    # driver runs); the fastest window is the closest view of the chip.
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            RT, s = forward(pc, obj_id, sym, jax.random.fold_in(key, i))
        np.asarray(RT)
        best = max(best, B * iters / (time.perf_counter() - t0))
    return best


def train_flops_per_sample(n: int = 1028) -> float:
    """Analytic matmul FLOPs of one *training* sample: 3x the eval forward
    (fwd + ~2x bwd) plus 3x the train-only recon/face heads (FaceRecon.py:37-68)
    eval never runs.  Derivation in scripts/train_batch_sweep.py."""
    head = 2 * n * (1286 * 512 + 512 * 512 + 512 * 256)
    head += 2 * n * (256 * 128 + 128 * 3)
    head += 2 * n * (771 * 512 + 512 * 256 + 256 * 128 + 128 * 30)
    return 3.0 * (model_flops_per_crop(n) + head)


def measure_train_step(cfg, iters: int = 15, batch_size: int | None = None) -> float:
    """Full train step (aug + 4 loss families + Ranger), ms/step, at
    ``batch_size`` (default: the config's reference-recipe batch 16)."""
    import jax
    import jax.numpy as jnp

    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model

    if batch_size is not None:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    batch_size=batch_size))
    model = build_model(cfg)
    tx, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    from hspose_tpu.utils.synthetic import synthetic_train_batch
    bs, n = cfg.train.batch_size, cfg.data.num_points
    batch = jax.tree.map(jnp.asarray, synthetic_train_batch(bs, n))
    key = jax.random.key(1)
    state, m = train_step(state, batch, key)
    np.asarray(m["total_loss"])
    best = float("inf")
    for _ in range(3):  # best-of-3 windows — see measure_inference
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = train_step(state, batch, key)
        np.asarray(m["total_loss"])
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    return best


def main():
    import jax

    # persistent compile cache: the remote-tunnel TPU compile of the full model is
    # minutes; cache it across bench invocations
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hspose_tpu.config import default_config

    cfg = default_config()
    cfg_fast = cfg.replace(model=dataclasses.replace(cfg.model,
                                                     compute_dtype="bfloat16"))
    n = cfg.data.num_points
    # the serving-batch sweep optimum and the eval harness default
    # (scripts/probe_serve_batch.py; re-probed after the round-4 graph slimming
    # — fast is flat over B=16..32, the split-gather tiers prefer 24)
    B = 24

    crops_per_sec = measure_inference(cfg_fast, B=B, iters=320)
    # the f32-faithful serving path (split-gather + bf16x3 v4 kernels) — the
    # parity/training-trust configuration
    exact_crops_per_sec = measure_inference(cfg, B=B, iters=80)
    # middle serving tier: 2-term-split feature gathers (~1.5e-5 relative,
    # mAP-parity evidence in scripts/fast_mode_parity.py) — one fewer MXU pass
    # per feature gather than exact
    cfg_x2 = cfg.replace(model=dataclasses.replace(cfg.model,
                                                   compute_dtype="f32x2"))
    f32x2_crops_per_sec = measure_inference(cfg_x2, B=B, iters=80)
    # opt-in relaxed-KNN tier: serve_k=16 measured INSIDE the 0.3-pt mAP
    # budget on the trained easy-pose probe model (worst |delta| 0.27 pts,
    # scripts/fast_mode_parity.py --easy; k=12 and rf_reuse are OUTSIDE and
    # rejected — docs/PERFORMANCE.md round-5 serving probe).  Reference
    # semantics (k=20) stay the default.
    cfg_k16 = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="bfloat16", serve_k=16))
    fast_k16_crops_per_sec = measure_inference(cfg_k16, B=B, iters=160)
    train_step_ms = measure_train_step(cfg)
    # bf16 mixed-precision training (f32 params/losses/Ranger; sanity-verified
    # — docs/PERFORMANCE.md): the large-scale option, f32 stays the default
    train_step_bf16_ms = measure_train_step(cfg_fast)
    # throughput-optimal training configuration: bf16 batch 24 (sweep in
    # scripts/train_batch_sweep.py / docs/PERFORMANCE.md — f32 is saturated at
    # batch 16; bf16 peaks at ~24, the same small-working-set effect as the
    # serving-batch sweep, and declines monotonically past it), sanity-verified
    # at this batch via `scripts/train_sanity.py 2500 --batch 24 --bf16
    # --anneal` (rot 88.9->22.2 deg, trans 0.6 cm — beats the batch-16 flat
    # baseline)
    TRAIN_OPT_BATCH = 24
    train_opt_ms = measure_train_step(cfg_fast, iters=26,
                                      batch_size=TRAIN_OPT_BATCH)
    train_samples_per_sec = TRAIN_OPT_BATCH / train_opt_ms * 1000
    train_mfu = train_samples_per_sec * train_flops_per_sample(n) \
        / V5E_BF16_PEAK_FLOPS

    mfu = crops_per_sec * model_flops_per_crop(n) / V5E_BF16_PEAK_FLOPS
    print(json.dumps({
        "metric": "pose_inference_throughput",
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / ASSUMED_3090_CROPS_PER_SEC, 2),
        "mfu": round(mfu, 4),
        "flops_per_crop": round(model_flops_per_crop(n) / 1e9, 2),
        "serve_batch": B,
        "exact_crops_per_sec": round(exact_crops_per_sec, 1),
        "f32x2_crops_per_sec": round(f32x2_crops_per_sec, 1),
        "fast_k16_crops_per_sec": round(fast_k16_crops_per_sec, 1),
        "train_step_ms": round(train_step_ms, 1),
        "train_step_bf16_ms": round(train_step_bf16_ms, 1),
        "train_samples_per_sec": round(train_samples_per_sec, 1),
        "train_mfu": round(train_mfu, 4),
        "train_opt_batch": TRAIN_OPT_BATCH,
        "baseline_basis": "inferred 200 crops/s on the reference's RTX 3090",
    }))


if __name__ == "__main__":
    main()

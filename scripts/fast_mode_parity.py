"""Fast-mode accuracy parity on a TRAINED model (the mAP-level evidence).

Trains the synthetic-box pose task (same harness as train_sanity.py), then runs
the eval path on held-out clouds twice — f32-exact vs bf16 fast mode (fused
kernels) — with identical weights, and reports:

(a) each mode's pose-error metrics and the direct per-crop deviation between
    the two modes' predictions (64 crops, quick signal);
(b) **mAP resolution**: 1024 held-out crops through BOTH serving modes and
    through the real ``compute_degree_cm_mAP`` harness (grouped 4 crops/image,
    full 61x21 degree/shift and 101-point IoU threshold grids, the REAL275
    configuration of evaluation/evaluate.py) — every reported headline metric
    (IoU25/50/75, 5°2cm … 10°10cm) must agree within **0.3 points**, the
    BASELINE.md accuracy budget the published table is held to
    (reference README.md:96-104).

Passing bar: all |Δ| ≤ 0.3 pts in (b); (a) is reported for diagnosis.

Run:  python scripts/fast_mode_parity.py [train_steps]   (TPU, ~8 min at 2500)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from train_sanity import make_batch, pose_errors  # noqa: E402

HEADLINE_BUDGET_PTS = 0.3


def map_table(model, params, batch_stats, n_crops=1024, eval_bs=256,
              crops_per_image=4, seed=123, easy=False):
    """Headline mAP metrics for one serving mode over n_crops held-out crops.

    Mirrors the production path exactly: jitted eval_forward + generate_RT give
    pred_RTs/pred_scales; results are grouped into images and pushed through
    compute_degree_cm_mAP with the evaluate.py threshold grids.
    """
    import jax
    import jax.numpy as jnp

    from hspose_tpu.evaluation.metrics import compute_degree_cm_mAP
    from hspose_tpu.geometry.rotations import generate_RT
    from hspose_tpu.geometry.symmetry import SYNSET_NAMES
    from hspose_tpu.models.hspose import eval_forward

    mean_shape = np.array([0.12, 0.18, 0.12], np.float32)
    rng = np.random.default_rng(seed)
    score_rng = np.random.default_rng(7)

    @jax.jit
    def forward(pc, obj_id, sym, key):
        out = eval_forward(model, params, batch_stats, key, pc, obj_id)
        RT = generate_RT(out.p_green_R, out.p_red_R, out.f_green_R,
                         out.f_red_R, out.pred_T, sym)
        return RT, out.pred_s

    results = []
    for start in range(0, n_crops, eval_bs):
        batch = make_batch(rng, eval_bs, 1028, mean_shape, easy=easy)
        key = jax.random.key(1000 + start)
        RT, s = forward(jnp.asarray(batch["pcl_in"]),
                        jnp.asarray(batch["cat_id"].astype(np.int32)),
                        jnp.asarray(batch["sym_info"]), key)
        RT = np.asarray(RT, np.float64)
        pred_scales = np.asarray(s, np.float64) + mean_shape[None]
        gt_scales = batch["fsnet_scale"] + mean_shape[None]
        gt_RT = np.tile(np.eye(4)[None], (eval_bs, 1, 1))
        gt_RT[:, :3, :3] = batch["rotation"]
        gt_RT[:, :3, 3] = batch["translation"]
        cls = batch["cat_id"].astype(np.int32) + 1  # synset ids are 1-based
        for j in range(0, eval_bs, crops_per_image):
            sl = slice(j, j + crops_per_image)
            n = crops_per_image
            results.append({
                "gt_class_ids": cls[sl],
                "gt_RTs": gt_RT[sl],
                "gt_scales": gt_scales[sl],
                "gt_handle_visibility": np.ones(n),
                "pred_class_ids": cls[sl],
                "pred_RTs": RT[sl],
                "pred_scales": pred_scales[sl],
                "pred_scores": score_rng.uniform(0.5, 1.0, n),
            })

    degree_thres_list = list(range(0, 61, 1))
    shift_thres_list = [i / 2 for i in range(21)]
    iou_thres_list = [i / 100 for i in range(101)]
    iou_aps, pose_aps = compute_degree_cm_mAP(
        results, SYNSET_NAMES, None, degree_thres_list, shift_thres_list,
        iou_thres_list, iou_pose_thres=0.1, use_matches_for_pose=True)
    full_deg = degree_thres_list + [360]
    full_shift = shift_thres_list + [100]
    return {
        "IoU25": iou_aps[-1, iou_thres_list.index(0.25)] * 100,
        "IoU50": iou_aps[-1, iou_thres_list.index(0.5)] * 100,
        "IoU75": iou_aps[-1, iou_thres_list.index(0.75)] * 100,
        "5d2cm": pose_aps[-1, full_deg.index(5), full_shift.index(2)] * 100,
        "5d5cm": pose_aps[-1, full_deg.index(5), full_shift.index(5)] * 100,
        "10d2cm": pose_aps[-1, full_deg.index(10), full_shift.index(2)] * 100,
        "10d5cm": pose_aps[-1, full_deg.index(10), full_shift.index(5)] * 100,
        "10d10cm": pose_aps[-1, full_deg.index(10), full_shift.index(10)] * 100,
    }


def main(steps=2500, easy=False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from hspose_tpu.config import default_config
    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.geometry.rotations import generate_RT
    from hspose_tpu.models.hspose import build_model, eval_forward

    cfg = default_config()
    # --easy: the probe model needs real mass in the 5-deg/2cm bins for the
    # tier study to test anything there — upright-pose distribution (see
    # train_sanity.upright_rotations) + the measured bf16 batch-24 anneal
    # recipe (docs/PERFORMANCE.md training batch sweep), longer schedule
    train_bs = 24 if easy else 16
    lr = 3e-4 * train_bs / 16
    cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, warmup_iters=100,
                                                lr=lr))
    if easy:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, train_steps=steps, total_epoch=1, batch_size=train_bs))
    mean_shape = np.array([0.12, 0.18, 0.12], np.float32)
    model_f32 = build_model(cfg)
    cfg_bf16 = cfg.replace(model=dataclasses.replace(cfg.model,
                                                     compute_dtype="bfloat16"))
    model_bf16 = build_model(cfg_bf16)

    train_model = model_bf16 if easy else model_f32
    train_cfg = cfg_bf16 if easy else cfg
    _, state, train_step = build_train_step(train_cfg, train_model,
                                            jax.random.key(0))
    rng = np.random.default_rng(0)
    key = jax.random.key(1)
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in
                 make_batch(rng, train_bs, cfg.data.num_points, mean_shape,
                            easy=easy).items()}
        state, metrics = train_step(state, batch, key)
        if i % 500 == 0:
            print(f"step {i}: loss {float(np.asarray(metrics['total_loss'])):.3f}",
                  flush=True)

    held_out = make_batch(np.random.default_rng(123), 64, cfg.data.num_points,
                          mean_shape, easy=easy)
    results = {}
    rts = {}
    for name, model in [("f32-exact", model_f32), ("bf16-fast", model_bf16)]:
        deg, cm, s_err = pose_errors(model, state.params, state.batch_stats,
                                     held_out, jax.random.key(7))
        results[name] = (deg, cm, s_err)
        out = eval_forward(model, state.params, state.batch_stats,
                           jax.random.key(7),
                           jnp.asarray(held_out["pcl_in"]),
                           jnp.asarray(held_out["cat_id"].astype(np.int32)))
        RT = np.asarray(generate_RT(out.p_green_R, out.p_red_R, out.f_green_R,
                                    out.f_red_R, out.pred_T,
                                    jnp.asarray(held_out["sym_info"])))
        rts[name] = (RT, np.asarray(out.pred_s))
        print(f"{name:10s}: rot {deg:.2f} deg | trans {cm:.2f} cm | "
              f"size {s_err:.4f}", flush=True)

    RT_a, s_a = rts["f32-exact"]
    RT_b, s_b = rts["bf16-fast"]
    y_a, y_b = RT_a[:, :3, 1], RT_b[:, :3, 1]
    ang = np.degrees(np.arccos(np.clip(np.sum(y_a * y_b, -1)
                                       / (np.linalg.norm(y_a, axis=-1)
                                          * np.linalg.norm(y_b, axis=-1)),
                                       -1, 1)))
    dt = np.linalg.norm(RT_a[:, :3, 3] - RT_b[:, :3, 3], axis=-1) * 100
    ds = np.abs(s_a - s_b).max()
    p50, p95, mx = (np.percentile(ang, 50), np.percentile(ang, 95), ang.max())
    print(f"mode-vs-mode axis deg: p50 {p50:.3f} | p95 {p95:.3f} | max {mx:.3f}",
          flush=True)
    print(f"mode-vs-mode: trans {np.percentile(dt, 95):.3f} cm p95 "
          f"({dt.max():.3f} max) | size {ds:.5f} max", flush=True)

    # mAP-level criterion: per-threshold accuracy agreement (the actual mAP
    # ingredient).  Per-crop divergence on an under-trained model tracks the
    # model's own uncertainty (both modes straddle the same ambiguity), so the
    # honest question is whether any metric BIN moves, not whether two noisy
    # axis estimates coincide.
    n = len(held_out["rotation"])
    R_gt = held_out["rotation"]
    t_gt = held_out["translation"]

    def bin_accs(RT):
        y_p = RT[:, :3, 1] / np.linalg.norm(RT[:, :3, 1], axis=-1, keepdims=True)
        deg = np.degrees(np.arccos(np.clip(
            np.sum(y_p * R_gt[:, :, 1], -1), -1, 1)))
        cm = np.linalg.norm(RT[:, :3, 3] - t_gt, axis=-1) * 100
        return {f"{d}deg": float((deg < d).mean()) for d in (5, 10, 20)} | \
               {f"{c}cm": float((cm < c).mean()) for c in (2, 5)}

    accs_a = bin_accs(RT_a)
    accs_b = bin_accs(RT_b)
    worst = 0.0
    for k in accs_a:
        delta = abs(accs_a[k] - accs_b[k])
        worst = max(worst, delta)
        print(f"acc@{k:6s}: f32 {accs_a[k]*100:5.1f}% | bf16 {accs_b[k]*100:5.1f}%"
              f" | delta {delta*100:.1f} pts", flush=True)
    da, dc, _ = results["f32-exact"]
    db, dcb, _ = results["bf16-fast"]
    # <= 2 crops flipping any bin (2/64 = 3.2 pts) + aggregate agreement
    ok = worst <= 2.0 / n + 1e-9 and abs(da - db) < 0.5 and abs(dc - dcb) < 0.1
    print("quick 64-crop screen:", "PASS" if ok else "FAIL", flush=True)

    # ---- phase (b): mAP resolution, 1024 crops, |delta| <= 0.3 pts ----------
    print("mAP-resolution study (1024 crops x 3 modes) ...", flush=True)
    model_x2 = build_model(cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="f32x2")))
    table_f32 = map_table(model_f32, state.params, state.batch_stats, easy=easy)
    table_bf16 = map_table(model_bf16, state.params, state.batch_stats,
                           easy=easy)
    table_x2 = map_table(model_x2, state.params, state.batch_stats, easy=easy)
    tables = [("f32-exact", table_f32), ("f32x2", table_x2),
              ("bf16-fast", table_bf16)]
    if easy:
        # relaxed-KNN serving tiers (config.py serve_k / serve_rf_reuse):
        # semantic relaxations, so they face the same 0.3-pt budget
        for name, knobs in [("bf16+rfre", {"serve_rf_reuse": True}),
                            ("bf16+k16", {"serve_k": 16}),
                            ("bf16+k12", {"serve_k": 12}),
                            ("bf16+k12r", {"serve_k": 12,
                                           "serve_rf_reuse": True})]:
            m = build_model(cfg.replace(model=dataclasses.replace(
                cfg.model, compute_dtype="bfloat16", **knobs)))
            tables.append((name, map_table(m, state.params, state.batch_stats,
                                           easy=easy)))
    worst_map = 0.0
    worst_by = {}
    print(f"{'metric':>8s} | " +
          " | ".join(f"{n:>9s}" for n, _ in tables) + " | worst delta")
    for k in table_f32:
        d = max(abs(table_f32[k] - t[k]) for _, t in tables[1:3])
        for n, t in tables[3:]:
            worst_by[n] = max(worst_by.get(n, 0.0), abs(table_f32[k] - t[k]))
        worst_map = max(worst_map, d)
        print(f"{k:>8s} | " +
              " | ".join(f"{t[k]:9.2f}" for _, t in tables) +
              f" | {d:.3f} pts", flush=True)
    for n, d in worst_by.items():
        print(f"relaxed tier {n}: worst |delta| {d:.3f} pts "
              f"({'inside' if d <= HEADLINE_BUDGET_PTS else 'OUTSIDE'} the "
              f"{HEADLINE_BUDGET_PTS}-pt budget)", flush=True)
    map_ok = worst_map <= HEADLINE_BUDGET_PTS
    print(f"worst headline delta: {worst_map:.3f} pts "
          f"(budget {HEADLINE_BUDGET_PTS})", flush=True)
    if easy:
        # the study only tests the tight bins if the probe model puts real
        # mass there (round-4 verdict weak-point: a near-empty 5d2cm bin
        # deflates deltas by construction).  The study populates ONE class
        # (make_batch labels every crop 'can'), so the 6-class-mean AP is
        # capped at 100/6 = 16.67 — measure mass RELATIVE to the study's own
        # ceiling (IoU25, which every crop of a trained model reaches):
        # >= 60% of ceiling means the bin carries the decisive majority of
        # crops, i.e. tier deltas there are fully load-bearing.
        ceiling = max(table_f32["IoU25"], 1e-9)
        mass = table_f32["5d2cm"] / ceiling * 100.0
        mass_ok = mass >= 60.0
        print(f"5d2cm mass: {table_f32['5d2cm']:.2f} AP = {mass:.0f}% of the "
              f"study ceiling {ceiling:.2f} "
              f"({'OK' if mass_ok else 'BELOW the 60% bar'})", flush=True)
        map_ok = map_ok and mass_ok
    print("FAST-MODE PARITY", "PASS" if (ok and map_ok) else "FAIL", flush=True)
    return ok and map_ok


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--easy"]
    main(int(argv[0]) if argv else 2500, easy="--easy" in sys.argv[1:])

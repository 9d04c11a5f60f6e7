"""Batched evaluation harness + CLI.

Equivalent of ``evaluation/evaluate.py`` (:28-207) with the TPU-first difference
that detection crops are batched *across* images into fixed-size padded batches (the
reference forwards one image at a time).  Reuses a cached ``pred_result.pkl`` when
present (ref :52-56), then computes the NOCS degree/cm mAP table on thresholds
0–60°×1 / 0–10cm×0.5 / IoU 0–1×0.01 (ref :127-129).

Run:  python -m hspose_tpu.evaluation.evaluate data.dataset_dir=... \
          train.resume_model=<ckpt> eval.eval_seed=1677483078
"""

from __future__ import annotations

import os
import pickle
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import numpy as np

from hspose_tpu.config import HSPoseConfig, parse_overrides
from hspose_tpu.geometry.symmetry import SYNSET_NAMES
from hspose_tpu.utils.logging import setup_logger


def batched_pose_inference(cfg: HSPoseConfig, model, params, batch_stats,
                           image_records, seed: int):
    """Run the posenet over all detection crops in fixed-size padded batches.

    image_records: iterable of (data_dict, detection_dict, gts) from
    PoseEvalDataset — a generator streams records with bounded memory (device
    mode ships 256² crops, ~4 MB/image; loading REAL275 upfront would be ~9 GB
    of host RAM), a list works too.  Fills each detection_dict with 'pred_RTs'
    and 'pred_scales' (and the gt_* fields the mAP stage needs); returns
    (pred_results, crops_per_second).

    The device fetch is double-buffered: each batch's ``np.asarray`` fetch
    happens only after the NEXT batch has been submitted, so the host↔device
    transfer overlaps the device compute instead of serializing with it.
    """
    import jax

    from hspose_tpu.config import ParallelConfig
    from hspose_tpu.geometry.rotations import generate_RT
    from hspose_tpu.models.hspose import eval_forward
    from hspose_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_state,
    )

    B = cfg.eval.eval_batch
    n_pts = cfg.data.num_points

    # shard crop batches over the data-parallel mesh axis (multi-chip serving
    # path; a 1-device mesh degenerates to the plain single-chip case).  With
    # parallel.mp > 1 the mesh is 2-D and the Dense head channels additionally
    # tensor-shard over the mp axis (parallel/mesh.py::state_sharding).  With
    # parallel.sp > 1 the mesh is (dp, sp) and each crop's POINT axis shards
    # over sp — the large-N serving layout (parallel/sp.py).
    n_dev = len(jax.devices())
    mp = max(cfg.parallel.mp, 1)
    sp = max(cfg.parallel.sp, 1)
    if mp > n_dev or sp > n_dev:
        raise ValueError(
            f"parallel.mp={mp}/parallel.sp={sp} exceeds the {n_dev} "
            f"available device(s)")
    if sp > 1 and mp > 1:
        raise ValueError("parallel.sp and parallel.mp are mutually exclusive")
    if sp > 1 and cfg.eval.recon:
        raise ValueError("eval.recon is not supported with parallel.sp")
    dp_req = cfg.parallel.dp if cfg.parallel.dp > 0 else n_dev // (mp * sp)
    if dp_req < 1:
        raise ValueError(
            f"parallel.mp={mp} x parallel.sp={sp} leaves no room for a data "
            f"axis on {n_dev} device(s) (need mp*sp <= n_devices)")
    dp = dp_req
    while B % dp != 0:
        dp -= 1
    import logging
    if dp < dp_req:
        logging.getLogger("eval_log").warning(
            "data axis shrunk dp=%d -> dp=%d (eval_batch %d not divisible "
            "by %d)", dp_req, dp, B, dp_req)
    if dp * mp * sp < n_dev:
        logging.getLogger("eval_log").warning(
            "mesh dp=%d x mp=%d x sp=%d uses %d of the %d available devices; "
            "the rest sit idle", dp, mp, sp, dp * mp * sp, n_dev)

    records = iter(image_records)
    try:
        first = next(records)
    except StopIteration:
        return [], 0.0
    # device mode ships 256² ROI crops; the fused jitted backprojection +
    # sampling then runs on-chip ahead of the model (data/preprocess.py,
    # shared with the train path)
    device_mode = "roi_depth" in first[0]
    crop_keys = (["roi_depth", "roi_mask", "roi_coord", "cam_k"]
                 if device_mode else ["pcl_in"])

    if sp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hspose_tpu.parallel.sp import (
            make_sp_mesh,
            sp_eval_fn,
            sp_points_per_device,
        )

        if device_mode:
            raise ValueError("parallel.sp needs host-sampled point clouds "
                             "(eval.sample_mode=host)")
        sp_points_per_device(n_pts, sp)
        mesh = make_sp_mesh(dp, sp)
        params, batch_stats = jax.device_put(
            (params, batch_stats), NamedSharding(mesh, P()))
        crop_sharding = NamedSharding(mesh, P("dp"))
        crop_shardings = {"pcl_in": NamedSharding(mesh, P("dp", "sp"))}
        sp_fn = sp_eval_fn(model, mesh)

        def forward_fn(crop, obj_id, sym, mean_shape, key):
            return sp_fn(params, batch_stats, crop["pcl_in"], obj_id, sym,
                         mean_shape, key)
    else:
        mesh = make_mesh(ParallelConfig(dp=dp, mp=mp), jax.devices()[:dp * mp])
        params, batch_stats = shard_state(mesh, (params, batch_stats))
        crop_sharding = batch_sharding(mesh)
        crop_shardings = {}
        forward_fn = _build_forward(cfg, model, params, batch_stats,
                                    device_mode, n_pts)

    key = jax.random.key(seed)
    state = {"t_start": None, "timed_from": 0, "fetched": 0}
    # per-record output holders; records complete in order
    pred_results: List[Dict] = []
    buf: Dict[str, List] = {k: [] for k in crop_keys}
    ids: List = []
    syms: List = []
    means: List = []
    owners: List = []
    in_flight = None  # (RT_dev, scales_dev, owners_slice, n_valid)
    batch_no = 0

    def ingest(rec):
        data, detection_dict, gts = rec
        rec_idx = len(pred_results)
        n = len(data["cat_id_0base"])
        for k in ["gt_class_ids", "gt_RTs", "gt_scales", "gt_handle_visibility"]:
            if k not in detection_dict and k in gts:
                detection_dict[k] = gts[k]
        detection_dict["pred_RTs"] = np.zeros((n, 4, 4))
        detection_dict["pred_scales"] = np.zeros((n, 3))
        if cfg.eval.recon:
            detection_dict["chamfer_dis_cass"] = np.zeros(n)
            detection_dict["emd_dis_cass"] = np.zeros(n)
        pred_results.append(detection_dict)
        for j in range(n):
            for k in crop_keys:
                buf[k].append(data[k][j])
            ids.append(data["cat_id_0base"][j])
            syms.append(data["sym_info"][j])
            means.append(data["mean_shape"][j])
            owners.append((rec_idx, j))

    def land(flight):
        outs, flight_owners, n_valid = flight
        # np.asarray is the synchronization point (block_until_ready does not
        # await on the tunneled axon backend)
        RT = np.asarray(outs[0])
        sc = np.asarray(outs[1])
        cmf = np.asarray(outs[2]) if len(outs) > 2 else None
        emd = np.asarray(outs[3]) if len(outs) > 3 else None
        for i, (rec_idx, j) in enumerate(flight_owners[:n_valid]):
            pred_results[rec_idx]["pred_RTs"][j] = RT[i]
            pred_results[rec_idx]["pred_scales"][j] = sc[i]
            if cmf is not None:
                pred_results[rec_idx]["chamfer_dis_cass"][j] = cmf[i]
                pred_results[rec_idx]["emd_dis_cass"][j] = emd[i]
        state["fetched"] += n_valid
        if state["t_start"] is None:
            # exclude the first (compile) batch from throughput timing
            state["t_start"] = time.time()
            state["timed_from"] = state["fetched"]

    def submit(n_valid):
        nonlocal in_flight, batch_no
        pad = B - n_valid
        crop = {k: np.stack(v[:n_valid] + [v[0]] * pad) for k, v in buf.items()}
        obj_id = np.array(ids[:n_valid] + [ids[0]] * pad, np.int32)
        sym = np.stack(syms[:n_valid] + [syms[0]] * pad)
        mean = np.stack(means[:n_valid] + [means[0]] * pad)
        flight_owners = owners[:n_valid]
        for k in crop_keys:
            del buf[k][:n_valid]
        del ids[:n_valid], syms[:n_valid], means[:n_valid], owners[:n_valid]
        outs = forward_fn(
            {k: jax.device_put(v, crop_shardings.get(k, crop_sharding))
             for k, v in crop.items()},
            jax.device_put(obj_id, crop_sharding),
            jax.device_put(sym, crop_sharding),
            jax.device_put(mean, crop_sharding),
            jax.random.fold_in(key, batch_no))
        batch_no += 1
        prev, in_flight = in_flight, (outs, flight_owners, n_valid)
        if prev is not None:
            land(prev)

    ingest(first)
    for rec in records:
        ingest(rec)
        while len(ids) >= B:
            submit(B)
    while ids:
        submit(min(B, len(ids)))
    if in_flight is not None:
        land(in_flight)

    elapsed = (time.time() - state["t_start"]) if state["t_start"] else 0.0
    timed = state["fetched"] - state["timed_from"]
    crops_per_sec = timed / elapsed if timed > 0 and elapsed > 0 else 0.0
    return pred_results, crops_per_sec


def _build_forward(cfg, model, params, batch_stats, device_mode: bool,
                   n_pts: int):
    import jax

    from hspose_tpu.geometry.rotations import generate_RT
    from hspose_tpu.models.hspose import eval_forward

    with_recon = cfg.eval.recon

    def recon_metrics(out, pc):
        """Per-instance chamfer + Sinkhorn-EMD between the reconstructed cloud
        and the observed points (the eval_recon producers)."""
        from hspose_tpu.ops.chamfer import chamfer_distance
        from hspose_tpu.ops.emd import emd_distance

        recon = out.recon.astype(jnp.float32)
        da, db = chamfer_distance(recon, pc)
        cmf = jnp.mean(da, axis=-1) + jnp.mean(db, axis=-1)  # (B,)
        emd = emd_distance(recon, pc, epsilon=cfg.eval.emd_epsilon,
                           iters=cfg.eval.emd_iters)
        return cmf, emd

    import jax.numpy as jnp

    if device_mode:
        from hspose_tpu.data.preprocess import roi_to_pointcloud

        @jax.jit
        def forward(crop, obj_id, sym, mean_shape, key):
            pc, _ = roi_to_pointcloud(key, crop["roi_depth"], crop["roi_mask"],
                                      crop["roi_coord"], crop["cam_k"], n_pts)
            out = eval_forward(model, params, batch_stats, key, pc, obj_id,
                               with_heads=with_recon)
            RT = generate_RT(out.p_green_R, out.p_red_R, out.f_green_R,
                             out.f_red_R, out.pred_T, sym)
            if with_recon:
                return RT, out.pred_s + mean_shape, *recon_metrics(out, pc)
            return RT, out.pred_s + mean_shape
    else:
        @jax.jit
        def forward(crop, obj_id, sym, mean_shape, key):
            out = eval_forward(model, params, batch_stats, key, crop["pcl_in"],
                               obj_id, with_heads=with_recon)
            RT = generate_RT(out.p_green_R, out.p_red_R, out.f_green_R,
                             out.f_red_R, out.pred_T, sym)
            if with_recon:
                return RT, out.pred_s + mean_shape, *recon_metrics(
                    out, crop["pcl_in"])
            return RT, out.pred_s + mean_shape

    return forward


def iter_eval_images(cfg: HSPoseConfig, seed: int, num_workers: int = 8,
                     limit: Optional[int] = None, window: int = 32):
    """Stream eval image records with a bounded look-ahead window.

    A ThreadPoolExecutor keeps at most ``window`` images in flight, so host
    memory stays bounded regardless of dataset size (the reference loads one
    image at a time, evaluate.py:79-119; loading everything upfront in device
    mode would hold ~9 GB of 256² crops for REAL275)."""
    from collections import deque

    from hspose_tpu.evaluation.eval_dataset import PoseEvalDataset

    ds = PoseEvalDataset(cfg.data, mode="test", sample_mode=cfg.eval.sample_mode)
    n = len(ds) if limit is None else min(limit, len(ds))

    def load(i):
        return ds.get_image(i, np.random.default_rng(np.random.SeedSequence([seed, i])))

    with ThreadPoolExecutor(max_workers=max(num_workers, 1)) as ex:
        futs = deque()
        nxt = 0
        while nxt < n or futs:
            while nxt < n and len(futs) < window:
                futs.append(ex.submit(load, nxt))
                nxt += 1
            rec = futs.popleft().result()
            if rec is not None:
                yield rec


def load_eval_images(cfg: HSPoseConfig, seed: int, num_workers: int = 8,
                     limit: Optional[int] = None):
    """Materialized list variant of :func:`iter_eval_images` (tests/tools)."""
    return list(iter_eval_images(cfg, seed, num_workers, limit))


def report_lines(iou_aps, pose_aps, degree_thres_list, shift_thres_list,
                 iou_thres_list, idx: int = -1) -> List[str]:
    """The README-style metric table (evaluation/evaluate.py:143-207)."""
    d05 = degree_thres_list.index(5)
    d10 = degree_thres_list.index(10)
    s02 = shift_thres_list.index(2)
    s05 = shift_thres_list.index(5)
    s10 = shift_thres_list.index(10)
    out = [
        "mAP:",
        "3D IoU at 25: {:.1f}".format(iou_aps[idx, iou_thres_list.index(0.25)] * 100),
        "3D IoU at 50: {:.1f}".format(iou_aps[idx, iou_thres_list.index(0.5)] * 100),
        "3D IoU at 75: {:.1f}".format(iou_aps[idx, iou_thres_list.index(0.75)] * 100),
        "5 degree, 2cm: {:.1f}".format(pose_aps[idx, d05, s02] * 100),
        "5 degree, 5cm: {:.1f}".format(pose_aps[idx, d05, s05] * 100),
        "10 degree, 2cm: {:.1f}".format(pose_aps[idx, d10, s02] * 100),
        "10 degree, 5cm: {:.1f}".format(pose_aps[idx, d10, s05] * 100),
        "10 degree, 10cm: {:.1f}".format(pose_aps[idx, d10, s10] * 100),
        "5 degree: {:.1f}".format(pose_aps[idx, d05, -1] * 100),
        "10 degree: {:.1f}".format(pose_aps[idx, d10, -1] * 100),
        "2cm: {:.1f}".format(pose_aps[idx, -1, s02] * 100),
        "5cm: {:.1f}".format(pose_aps[idx, -1, s05] * 100),
        "10cm: {:.1f}".format(pose_aps[idx, -1, s10] * 100),
    ]
    return out


def evaluate(cfg: HSPoseConfig) -> Dict[str, float]:
    from hspose_tpu.evaluation.metrics import compute_degree_cm_mAP

    seed = cfg.eval.eval_seed if cfg.eval.eval_seed != -1 else int(time.time())
    model_name = os.path.basename(cfg.train.resume_model).split(".")[0] or "model"
    output_path = os.path.join(cfg.train.model_save, f"eval_result_{model_name}")
    os.makedirs(output_path, exist_ok=True)
    logger = setup_logger("eval_log", os.path.join(cfg.train.model_save,
                                                   "log_eval.txt"))

    pred_path = os.path.join(output_path, "pred_result.pkl")
    crops_per_sec = 0.0
    if os.path.exists(pred_path):
        with open(pred_path, "rb") as f:
            pred_results = pickle.load(f)
    else:
        from hspose_tpu.models.hspose import build_model
        from hspose_tpu.utils.params_io import load_params

        model = build_model(cfg)
        params, batch_stats = load_params(cfg, cfg.train.resume_model)
        logger.info("streaming eval images through batched inference...")
        # streamed: images load in a bounded window while the previous crop
        # batches run on-device; gt fields are merged inside the harness
        from hspose_tpu.data.dataset import resolve_num_workers

        pred_results, crops_per_sec = batched_pose_inference(
            cfg, model, params, batch_stats,
            iter_eval_images(cfg, seed,
                             resolve_num_workers(cfg.data.num_workers)), seed)
        logger.info(f"{len(pred_results)} images evaluated")
        with open(pred_path, "wb") as f:
            pickle.dump(pred_results, f)
        logger.info(f"inference throughput: {crops_per_sec:.1f} crops/s")

    if cfg.eval.eval_inference_only:
        return {"crops_per_sec": crops_per_sec}

    degree_thres_list = list(range(0, 61, 1))
    shift_thres_list = [i / 2 for i in range(21)]
    iou_thres_list = [i / 100 for i in range(101)]

    iou_aps, pose_aps = compute_degree_cm_mAP(
        pred_results, SYNSET_NAMES, output_path, degree_thres_list,
        shift_thres_list, iou_thres_list, iou_pose_thres=0.1,
        use_matches_for_pose=True, plot_figure=True, eval_recon=cfg.eval.recon)
    if cfg.eval.recon:
        # aggregate directly from the in-memory results (compute_degree_cm_mAP
        # also writes recon_metrics.json for offline use, but the log line must
        # not depend on that side-effect file existing)
        from hspose_tpu.evaluation.metrics import aggregate_recon_metrics

        recon_stats = aggregate_recon_metrics(pred_results, SYNSET_NAMES)
        logger.info("recon metrics (eval_recon): %s", recon_stats)

    full_deg = degree_thres_list + [360]
    full_shift = shift_thres_list + [100]
    idx = (SYNSET_NAMES.index(cfg.data.per_obj)
           if cfg.data.per_obj in SYNSET_NAMES else -1)
    logger.info("Evaluation Seed: {}".format(seed))
    for line in report_lines(iou_aps, pose_aps, full_deg, full_shift,
                             iou_thres_list, idx):
        logger.info(line)
    if idx == -1:
        for cls_id in range(1, len(SYNSET_NAMES)):
            logger.info(f"category {SYNSET_NAMES[cls_id]}")
            for line in report_lines(iou_aps, pose_aps, full_deg, full_shift,
                                     iou_thres_list, cls_id):
                logger.info(line)

    return {
        "IoU25": iou_aps[-1, iou_thres_list.index(0.25)] * 100,
        "IoU50": iou_aps[-1, iou_thres_list.index(0.5)] * 100,
        "IoU75": iou_aps[-1, iou_thres_list.index(0.75)] * 100,
        "5d2cm": pose_aps[-1, full_deg.index(5), full_shift.index(2)] * 100,
        "5d5cm": pose_aps[-1, full_deg.index(5), full_shift.index(5)] * 100,
        "10d2cm": pose_aps[-1, full_deg.index(10), full_shift.index(2)] * 100,
        "10d5cm": pose_aps[-1, full_deg.index(10), full_shift.index(5)] * 100,
        "10d10cm": pose_aps[-1, full_deg.index(10), full_shift.index(10)] * 100,
        "crops_per_sec": crops_per_sec,
    }


def main(argv=None):
    from hspose_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    cfg = parse_overrides(sys.argv[1:] if argv is None else argv)
    evaluate(cfg)


if __name__ == "__main__":
    main()

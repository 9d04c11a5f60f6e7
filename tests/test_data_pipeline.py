"""Data pipeline tests over a synthetic on-disk NOCS-format dataset."""

import dataclasses
import os
import pickle

import cv2
import numpy as np
import pytest

from hspose_tpu.config import DataConfig
from hspose_tpu.data import image_utils as iu
from hspose_tpu.data.dataset import (
    PoseTrainDataset,
    host_depth_to_pcl,
    host_sample_points,
    train_batches,
)

H, W = 480, 640


def _write_scene(root, split, scene, img_id, class_ids, with_detections=False,
                 source="Real"):
    scene_dir = os.path.join(root, source, split, scene)
    os.makedirs(scene_dir, exist_ok=True)
    prefix = os.path.join(scene_dir, img_id)
    rng = np.random.default_rng(hash((scene, img_id)) % 2**31)

    n = len(class_ids)
    inst_ids = list(range(1, n + 1))
    bboxes = []
    mask = np.zeros((H, W, 3), np.uint8)
    depth = np.zeros((H, W), np.uint16)
    for k, inst in enumerate(inst_ids):
        y0, x0 = 120 + 60 * k, 160 + 80 * k
        y1, x1 = y0 + 80, x0 + 90
        bboxes.append([y0, x0, y1, x1])
        mask[y0:y1, x0:x1, 2] = inst
        depth[y0:y1, x0:x1] = 600 + 40 * k + rng.integers(0, 20, (80, 90))

    cv2.imwrite(prefix + "_color.png", rng.integers(0, 255, (H, W, 3)).astype(np.uint8))
    cv2.imwrite(prefix + "_depth.png", depth)
    cv2.imwrite(prefix + "_mask.png", mask)

    A = rng.normal(size=(n, 3, 3))
    Q, _ = np.linalg.qr(A)
    Q *= np.sign(np.linalg.det(Q))[:, None, None]
    gts = {
        "class_ids": list(class_ids),
        "instance_ids": inst_ids,
        "model_list": [f"model_{c}" for c in class_ids],
        "scales": [0.2 + 0.05 * k for k in range(n)],
        "rotations": [Q[k].astype(np.float32) for k in range(n)],
        "translations": [np.array([0.05 * k, 0.0, 0.65], np.float32)
                         for k in range(n)],
        "bboxes": bboxes,
        # fields used only by the metric side
        "gt_class_ids": np.array(class_ids, np.int32),
        "gt_RTs": np.stack([np.eye(4)] * n),
        "gt_scales": np.tile(np.array([[0.1, 0.15, 0.1]]), (n, 1)),
        "gt_handle_visibility": np.ones(n),
    }
    with open(prefix + "_label.pkl", "wb") as f:
        pickle.dump(gts, f)

    if with_detections:
        det_split = "REAL275" if source == "Real" else "CAMERA25"
        det_mode = "test" if source == "Real" else "val"
        det_dir = os.path.join(os.path.dirname(root), "segmentation_results", det_split)
        os.makedirs(det_dir, exist_ok=True)
        det = {
            "pred_class_ids": np.array(class_ids, np.int32),
            "pred_bboxes": np.array(bboxes, np.int32),
            "pred_scores": np.linspace(0.9, 0.7, n),
            "pred_masks": (mask[:, :, 2:3] > 0).astype(np.uint8)
            * np.zeros((H, W, n), np.uint8),
            "gt_class_ids": gts["gt_class_ids"],
            "gt_RTs": gts["gt_RTs"],
            "gt_scales": gts["gt_scales"],
            "gt_handle_visibility": gts["gt_handle_visibility"],
        }
        masks = np.zeros((H, W, n), np.uint8)
        for k, inst in enumerate(inst_ids):
            masks[:, :, k] = (mask[:, :, 2] == inst).astype(np.uint8)
        det["pred_masks"] = masks
        with open(os.path.join(det_dir, f"results_{det_mode}_{scene}_{img_id}.pkl"),
                  "wb") as f:
            pickle.dump(det, f)
    return gts


@pytest.fixture(scope="module")
def nocs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nocs") / "NOCS"
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)

    # train split: two images
    _write_scene(str(root), "train", "scene_1", "0000", [1, 6])
    _write_scene(str(root), "train", "scene_1", "0001", [2, 4])
    with open(root / "Real" / "train_list.txt", "w") as f:
        f.write("train/scene_1/0000\ntrain/scene_1/0001\n")

    # test split: one image with detections
    _write_scene(str(root), "test", "scene_2", "0000", [1, 3], with_detections=True)
    with open(root / "Real" / "test_list.txt", "w") as f:
        f.write("test/scene_2/0000\n")

    # models
    models = {}
    for c in [1, 2, 3, 4, 6]:
        models[f"model_{c}"] = rng.normal(scale=0.2, size=(1024, 3)).astype(np.float32)
    os.makedirs(root / "obj_models", exist_ok=True)
    for name in ["real_train.pkl", "real_test.pkl"]:
        with open(root / "obj_models" / name, "wb") as f:
            pickle.dump(models, f)

    # mug handle table
    with open(root / "Real" / "train" / "mug_handle.pkl", "wb") as f:
        pickle.dump({"scene_1_res": {0: 0, 1: 1}}, f)
    return str(root)


@pytest.fixture
def data_cfg(nocs_root):
    return DataConfig(dataset="Real", dataset_dir=nocs_root,
                      detection_dir=os.path.join(os.path.dirname(nocs_root),
                                                 "segmentation_results"),
                      num_workers=0)


class TestTrainDataset:
    def test_sample_shapes(self, data_cfg, rng):
        ds = PoseTrainDataset(data_cfg)
        assert len(ds) == 2
        s = ds.get_sample(0, rng)
        assert s is not None
        assert s["pcl_in"].shape == (1028, 3)
        assert s["rotation"].shape == (3, 3)
        assert s["model_point"].shape == (1024, 3)
        assert s["sym_info"].shape == (4,)
        # cloud is metric-scale, near the synthetic depth plane z≈0.6m
        assert 0.4 < np.median(s["pcl_in"][:, 2]) < 0.9

    def test_mug_handle_lookup(self, data_cfg):
        ds = PoseTrainDataset(data_cfg)
        # image 0 has classes [1, 6]; mug (6) with handle 0 in the table -> sym [1,0,0,0]
        for seed in range(20):
            rng = np.random.default_rng(seed)
            s = ds.get_sample(0, rng)
            if int(s["cat_id"]) == 5:  # mug, 0-based
                np.testing.assert_array_equal(s["sym_info"], [1, 0, 0, 0])
                return
        pytest.fail("mug sample never drawn")

    def test_corrupt_color_walks_forward(self, data_cfg, rng):
        """A corrupt color PNG must retry-walk to the next index like the
        reference's decode failure (load_data.py:219-227) — on BOTH the native
        and the cv2 fallback branches (the integrity check is shared,
        image_utils.png_color_valid), for header corruption AND for a file
        with an intact header but corrupt/truncated pixel data (the strict
        semantics the reference's full decode enforces)."""
        ds = PoseTrainDataset(data_cfg)
        color0 = os.path.join(data_cfg.dataset_dir, ds.img_list[0] + "_color.png")
        with open(color0, "rb") as f:
            good = f.read()
        idat = good.index(b"IDAT")
        body_corrupt = bytearray(good)
        body_corrupt[idat + 8] ^= 0xFF  # bit-flip inside the IDAT payload
        variants = {
            "header": b"not a png at all",
            "body": bytes(body_corrupt),
            "truncated": good[:idat + 12],
        }
        try:
            for label, blob in variants.items():
                with open(color0, "wb") as f:
                    f.write(blob)
                for native in (True, False):
                    ds_n = PoseTrainDataset(
                        dataclasses.replace(data_cfg, native_preproc=native))
                    s = ds_n.get_sample(0, np.random.default_rng(0))
                    # image 0 holds classes [1, 6]; image 1 holds [2, 4] — a
                    # walked sample must come from image 1 (0-based cats {1, 3})
                    assert s is not None and int(s["cat_id"]) in (1, 3), \
                        f"native={native}: corrupt color ({label}) not walked"
        finally:
            with open(color0, "wb") as f:
                f.write(good)

    def test_batches_collate(self, data_cfg):
        ds = PoseTrainDataset(data_cfg)
        batches = list(train_batches(ds, batch_size=4, steps=3, seed=7, num_workers=0))
        assert len(batches) == 3
        assert batches[0]["pcl_in"].shape == (4, 1028, 3)
        assert batches[0]["cat_id"].shape == (4,)
        # reproducibility: same seed -> same stream
        again = list(train_batches(ds, batch_size=4, steps=3, seed=7, num_workers=0))
        np.testing.assert_array_equal(batches[1]["pcl_in"], again[1]["pcl_in"])

    def test_threaded_matches_sync(self, data_cfg):
        ds = PoseTrainDataset(data_cfg)
        sync = list(train_batches(ds, 2, 4, seed=3, num_workers=0))
        threaded = list(train_batches(ds, 2, 4, seed=3, num_workers=3))
        for a, b in zip(sync, threaded):
            np.testing.assert_array_equal(a["pcl_in"], b["pcl_in"])

    def test_process_pool_matches_sync(self, data_cfg):
        from hspose_tpu.data.dataset import make_worker_pool

        ds = PoseTrainDataset(data_cfg)
        sync = list(train_batches(ds, 2, 3, seed=3, num_workers=0))
        pool = make_worker_pool(data_cfg, num_workers=2)
        try:
            pooled = list(train_batches(ds, 2, 3, seed=3, pool=pool))
        finally:
            pool.terminate()
        for a, b in zip(sync, pooled):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_device_mode_returns_crops(self, data_cfg, rng):
        cfg = dataclasses.replace(data_cfg)
        ds = PoseTrainDataset(cfg, sample_mode="device")
        s = ds.get_sample(0, rng)
        assert s["roi_depth"].shape == (256, 256)
        assert s["roi_coord"].shape == (2, 256, 256)
        assert s["cam_k"].shape == (3, 3)


class TestEvalDataset:
    def test_eval_image(self, data_cfg, rng):
        from hspose_tpu.evaluation.eval_dataset import PoseEvalDataset
        ds = PoseEvalDataset(data_cfg)
        rec = ds.get_image(0, rng)
        assert rec is not None
        data, det, gts = rec
        assert data["pcl_in"].shape == (2, 1028, 3)
        assert list(data["cat_id"]) == [1, 3]
        assert "pred_masks" not in det
        assert det["pred_scores"].shape == (2,)

    def test_eval_image_device_mode(self, data_cfg, rng):
        """Device mode ships 256² crops; the fused on-chip preprocessing must
        reproduce the host back-projection (same ROI inputs, keyed sampling)."""
        import jax
        import jax.numpy as jnp

        from hspose_tpu.data.preprocess import roi_to_pointcloud
        from hspose_tpu.evaluation.eval_dataset import PoseEvalDataset

        ds = PoseEvalDataset(data_cfg, sample_mode="device")
        data, det, gts = ds.get_image(0, rng)
        assert "pcl_in" not in data
        assert data["roi_depth"].shape == (2, 256, 256)
        assert data["roi_coord"].shape == (2, 2, 256, 256)
        assert data["cam_k"].shape == (2, 3, 3)

        pcl, n_valid = roi_to_pointcloud(
            jax.random.key(0), jnp.asarray(data["roi_depth"]),
            jnp.asarray(data["roi_mask"]), jnp.asarray(data["roi_coord"]),
            jnp.asarray(data["cam_k"]), 1028)
        assert pcl.shape == (2, 1028, 3)
        # every sampled point must be a member of the host-mode full cloud
        from hspose_tpu.data.dataset import host_depth_to_pcl
        for i in range(2):
            full = host_depth_to_pcl(data["roi_depth"][i], data["cam_k"][i],
                                     data["roi_coord"][i],
                                     data["roi_mask"][i]) / 1000.0
            from scipy.spatial import cKDTree
            d, _ = cKDTree(full).query(np.asarray(pcl[i]))
            assert d.max() < 1e-6

    def test_eval_inference_device_mode(self, data_cfg, rng):
        """batched_pose_inference over device-mode records (preprocessing
        fused into the jitted forward)."""
        import dataclasses as dc

        from hspose_tpu.config import default_config
        from hspose_tpu.evaluation.eval_dataset import PoseEvalDataset
        from hspose_tpu.evaluation.evaluate import batched_pose_inference
        from hspose_tpu.models.hspose import build_model
        import jax

        cfg = default_config()
        cfg = cfg.replace(
            data=dc.replace(data_cfg, num_points=128),
            eval=dc.replace(cfg.eval, eval_batch=2, sample_mode="device"))
        ds = PoseEvalDataset(cfg.data, sample_mode="device")
        records = [ds.get_image(0, rng)]
        model = build_model(cfg)
        variables = model.init(
            {"params": jax.random.key(0), "pool": jax.random.key(1),
             "dropout": jax.random.key(2)},
            np.zeros((2, 128, 3), np.float32), np.zeros((2,), np.int32), True)
        preds, _ = batched_pose_inference(cfg, model, variables["params"],
                                          variables["batch_stats"], records, 0)
        assert preds[0]["pred_RTs"].shape == (2, 4, 4)
        assert np.isfinite(preds[0]["pred_RTs"]).all()
        assert np.isfinite(preds[0]["pred_scales"]).all()


class TestDevicePreprocessParity:
    def test_backprojection_matches_host(self, data_cfg, rng):
        import jax
        import jax.numpy as jnp
        from hspose_tpu.data.preprocess import backproject_roi

        ds = PoseTrainDataset(data_cfg, sample_mode="device")
        s = ds.get_sample(0, rng)
        pts, valid = backproject_roi(jnp.asarray(s["roi_depth"]),
                                     jnp.asarray(s["roi_mask"]),
                                     jnp.asarray(s["roi_coord"]),
                                     jnp.asarray(s["cam_k"]))
        host = host_depth_to_pcl(s["roi_depth"], s["cam_k"], s["roi_coord"],
                                 s["roi_mask"])
        dev = np.asarray(pts)[np.asarray(valid)]
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, atol=1e-2)  # mm scale

    def test_roi_to_pointcloud_shapes(self, data_cfg, rng):
        import jax
        import jax.numpy as jnp
        from hspose_tpu.data.preprocess import roi_to_pointcloud

        ds = PoseTrainDataset(data_cfg, sample_mode="device")
        s0 = ds.get_sample(0, rng)
        s1 = ds.get_sample(1, rng)
        depth = jnp.stack([jnp.asarray(s0["roi_depth"]), jnp.asarray(s1["roi_depth"])])
        mask = jnp.stack([jnp.asarray(s0["roi_mask"]), jnp.asarray(s1["roi_mask"])])
        coord = jnp.stack([jnp.asarray(s0["roi_coord"]), jnp.asarray(s1["roi_coord"])])
        cam = jnp.stack([jnp.asarray(s0["cam_k"]), jnp.asarray(s1["cam_k"])])
        pcl, n_valid = roi_to_pointcloud(jax.random.key(0), depth, mask, coord, cam,
                                         256)
        assert pcl.shape == (2, 256, 3)
        assert int(n_valid.min()) > 50
        # metres, near the synthetic plane
        med = np.median(np.asarray(pcl)[..., 2])
        assert 0.4 < med < 0.9


class TestWorkerAutosize:
    """data.num_workers=-1 auto-sizes the loader pool from host cores and the
    train loop warns when the pool cannot feed the measured step rate
    (reference analog: the hardcoded num_workers=20, engine/train.py:65-69)."""

    def test_explicit_honored(self):
        from hspose_tpu.data.dataset import resolve_num_workers
        assert resolve_num_workers(0) == 0
        assert resolve_num_workers(7) == 7

    def test_auto_from_cpu_count(self, monkeypatch):
        import hspose_tpu.data.dataset as dsm
        monkeypatch.setattr(dsm.os, "cpu_count", lambda: 12)
        assert dsm.resolve_num_workers(-1) == 11
        monkeypatch.setattr(dsm.os, "cpu_count", lambda: 1)
        assert dsm.resolve_num_workers(-1) == 1

    def test_starvation_warning(self, monkeypatch):
        import logging

        import hspose_tpu.data.dataset as dsm

        class Capture(logging.Handler):
            def __init__(self):
                super().__init__()
                self.records = []

            def emit(self, record):
                self.records.append(record.getMessage())

        logger = logging.getLogger("test_worker_autosize")
        cap = Capture()
        logger.addHandler(cap)
        try:
            # 2 workers x 121/s < 468/s step rate -> warn
            monkeypatch.setattr(dsm.os, "cpu_count", lambda: 3)
            n = dsm.resolve_num_workers(-1, dsm.estimated_step_rate("bfloat16"),
                                        logger)
            assert n == 2
            assert any("starve" in m for m in cap.records)
            # plenty of workers -> silent
            cap.records.clear()
            dsm.resolve_num_workers(8, dsm.estimated_step_rate("float32"),
                                    logger)
            assert not cap.records
        finally:
            logger.removeHandler(cap)


class TestImageUtils:
    def test_get_bbox_square_and_clamped(self):
        rmin, rmax, cmin, cmax = iu.get_bbox([10, 10, 60, 90])
        assert (rmax - rmin) == (cmax - cmin)
        assert (rmax - rmin) % 40 == 0
        rmin, rmax, cmin, cmax = iu.get_bbox([400, 560, 478, 638])
        assert 0 <= rmin and rmax <= 480 and 0 <= cmin and cmax <= 640

    def test_png_header_dims(self, tmp_path):
        p = str(tmp_path / "x.png")
        cv2.imwrite(p, np.zeros((7, 11, 3), np.uint8))
        assert iu.png_header_dims(p) == (7, 11)
        assert iu.png_header_dims(str(tmp_path / "missing.png")) is None
        with open(p, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n garbage")  # signature but no IHDR
        assert iu.png_header_dims(p) is None
        with open(p, "wb") as f:
            f.write(b"JFIF not a png either")
        assert iu.png_header_dims(p) is None

    def test_png_color_valid(self, tmp_path):
        """Chunk-walk + critical-CRC validation must accept exactly what cv2
        accepts and reject what a full decode would reject (truncation, bit
        corruption of IDAT) — the reference's color-decode semantics
        (load_data.py:219-227) without the pixel decode."""
        p = str(tmp_path / "c.png")
        cv2.imwrite(p, np.random.default_rng(0).integers(
            0, 255, (9, 13, 3)).astype(np.uint8))
        assert iu.png_color_valid(p) == (9, 13)
        with open(p, "rb") as f:
            good = f.read()
        # cv2 agrees the pristine file decodes
        assert cv2.imread(p) is not None

        # 1) flip a byte inside the IDAT payload (body corruption, intact
        # header): cv2 decode fails, and so must the CRC check
        idat = good.index(b"IDAT")
        bad = bytearray(good)
        bad[idat + 8] ^= 0xFF
        with open(p, "wb") as f:
            f.write(bytes(bad))
        assert cv2.imread(p) is None or iu.png_color_valid(p) is None
        assert iu.png_color_valid(p) is None

        # 2) truncate mid-IDAT: both reject
        with open(p, "wb") as f:
            f.write(good[:idat + 12])
        assert iu.png_color_valid(p) is None

        # 3) missing IEND (truncated after a complete IDAT chunk): reject
        iend = good.index(b"IEND")
        with open(p, "wb") as f:
            f.write(good[:iend - 4])
        assert iu.png_color_valid(p) is None

        # 4) missing / non-PNG
        assert iu.png_color_valid(str(tmp_path / "missing.png")) is None
        with open(p, "wb") as f:
            f.write(b"JFIF not a png")
        assert iu.png_color_valid(p) is None

    def test_load_depth_roundtrip(self, tmp_path):
        d = (np.random.default_rng(0).integers(0, 3000, (32, 32))).astype(np.uint16)
        p = str(tmp_path / "d.png")
        cv2.imwrite(p, d)
        np.testing.assert_array_equal(iu.load_depth(p), d)

    def test_warp_affine_identity_center(self):
        img = np.arange(100, dtype=np.float32).reshape(10, 10)
        out = iu.crop_resize_by_warp_affine(img, (5, 5), 10, 10)
        np.testing.assert_allclose(out, img)

    def test_defor_2d_preserves_shape_and_binary(self, rng):
        mask = np.zeros((64, 64), np.float32)
        mask[20:40, 20:40] = 1.0
        out = iu.defor_2d_mask(rng, mask.copy(), rand_r=3, rand_pro=1.0)
        assert out.shape == mask.shape
        assert set(np.unique(out)).issubset({0.0, 1.0})

    def test_host_sample_points_up_down(self, rng):
        pts = rng.normal(size=(2000, 3)).astype(np.float32)
        out = host_sample_points(rng, pts, 1028)
        assert out.shape == (1028, 3)
        out = host_sample_points(rng, pts[:100], 1028)
        assert out.shape == (1028, 3)

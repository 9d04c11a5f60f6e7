"""Bit-exactness of the native preprocessing library (native/preproc.cpp)
against the in-repo cv2 path — PNG decode semantics (reference
``tools/eval_utils.load_depth`` :143-156) and the fixed-point INTER_NEAREST
warp crops (``tools/dataset_utils.py:80-136``)."""

import cv2
import numpy as np
import pytest

from hspose_tpu.data import image_utils as iu
from hspose_tpu.data import native_preproc as npp

pytestmark = pytest.mark.skipif(npp.get_lib() is None,
                                reason="native preproc library unavailable")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="module")
def data_cfg(tmp_path_factory):
    """Synthetic NOCS tree (reuses the test_data_pipeline builder)."""
    import os

    from hspose_tpu.config import DataConfig
    from tests.test_data_pipeline import _write_scene

    root = tmp_path_factory.mktemp("nocs_native") / "NOCS"
    os.makedirs(root, exist_ok=True)
    _write_scene(str(root), "train", "scene_1", "0000", [1, 6])
    _write_scene(str(root), "train", "scene_1", "0001", [2, 4])
    with open(root / "Real" / "train_list.txt", "w") as f:
        f.write("train/scene_1/0000\ntrain/scene_1/0001\n")
    _write_scene(str(root), "test", "scene_2", "0000", [1, 3], with_detections=True)
    with open(root / "Real" / "test_list.txt", "w") as f:
        f.write("test/scene_2/0000\n")
    import pickle

    rng_ = np.random.default_rng(0)
    models = {f"model_{c}": rng_.normal(scale=0.2, size=(1024, 3)).astype(np.float32)
              for c in [1, 2, 3, 4, 6]}
    os.makedirs(root / "obj_models", exist_ok=True)
    for name in ["real_train.pkl", "real_test.pkl"]:
        with open(root / "obj_models" / name, "wb") as f:
            pickle.dump(models, f)
    with open(root / "Real" / "train" / "mug_handle.pkl", "wb") as f:
        pickle.dump({"scene_1_res": {0: 0, 1: 1}}, f)
    return DataConfig(dataset="Real", dataset_dir=str(root),
                      detection_dir=os.path.join(os.path.dirname(str(root)),
                                                 "segmentation_results"),
                      num_workers=0)


def _write_depth16(path, rng, h=120, w=160):
    depth = (rng.integers(0, 4000, (h, w)) * (rng.random((h, w)) > 0.3)).astype(np.uint16)
    cv2.imwrite(str(path), depth)
    return depth


def _write_mask_gray(path, rng, h=120, w=160, n_inst=5):
    mask = rng.integers(0, n_inst + 1, (h, w)).astype(np.uint8)
    cv2.imwrite(str(path), mask)
    return mask


class TestDecode:
    def test_png_dims(self, tmp_path, rng):
        _write_depth16(tmp_path / "d.png", rng, 77, 131)
        assert npp.png_dims(str(tmp_path / "d.png")) == (77, 131)
        assert npp.png_dims(str(tmp_path / "missing.png")) is None

    def test_depth16_matches_cv2(self, tmp_path, rng):
        p = tmp_path / "d.png"
        _write_depth16(p, rng)
        want = iu.load_depth(str(p))
        got = npp.decode_depth(str(p))
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, want)

    def test_rgb_encoded_depth_matches_cv2(self, tmp_path, rng):
        # 256*G + B-channel-of-BGR (== R of the PNG), with the 32001 sentinel
        h, w = 60, 80
        vals = rng.integers(0, 60000, (h, w)).astype(np.int32)
        vals[0, :5] = 32001  # sentinel -> 0
        bgr = np.zeros((h, w, 3), np.uint8)
        bgr[:, :, 1] = (vals // 256).astype(np.uint8)
        bgr[:, :, 2] = (vals % 256).astype(np.uint8)
        p = tmp_path / "d3.png"
        cv2.imwrite(str(p), bgr)
        want = iu.load_depth(str(p))
        got = npp.decode_depth(str(p))
        np.testing.assert_array_equal(got, want)

    def test_gray8_depth_rejected_like_cv2(self, tmp_path, rng):
        # 8-bit grayscale raises ValueError in load_depth -> native returns None
        p = tmp_path / "d8.png"
        cv2.imwrite(str(p), rng.integers(0, 255, (40, 40)).astype(np.uint8))
        with pytest.raises(ValueError):
            iu.load_depth(str(p))
        assert npp.decode_depth(str(p)) is None

    def test_corrupt_png(self, tmp_path):
        p = tmp_path / "bad.png"
        p.write_bytes(b"\x89PNG\r\n\x1a\n" + b"garbage" * 10)
        assert npp.decode_depth(str(p)) is None
        assert npp.png_dims(str(p)) is None


def _python_train_crops(depth_path, mask_path, inst_id, center, scale, o):
    depth = iu.load_depth(depth_path)
    mask = cv2.imread(mask_path)[:, :, 2]
    im_h, im_w = mask.shape[:2]
    coord_2d = iu.get_2d_coord(im_w, im_h)
    roi_coord = iu.crop_resize_by_warp_affine(
        coord_2d.transpose(1, 2, 0), center, scale, o).transpose(2, 0, 1)
    roi_mask = iu.crop_resize_by_warp_affine(
        (mask == inst_id).astype(np.float32), center, scale, o)
    roi_depth = iu.crop_resize_by_warp_affine(depth.astype(np.float32), center,
                                              scale, o)
    return roi_depth, roi_mask, roi_coord


class TestTrainSample:
    @pytest.mark.parametrize("o", [64, 256])
    def test_matches_cv2_fuzz(self, tmp_path, rng, o):
        dp, mp = str(tmp_path / "d.png"), str(tmp_path / "m.png")
        _write_depth16(tmp_path / "d.png", rng)
        _write_mask_gray(tmp_path / "m.png", rng)
        for trial in range(25):
            # mix of eval-style integer-valued and DZI-style random-float crops,
            # including windows hanging off every image edge
            if trial % 2 == 0:
                cx, cy = float(rng.integers(-20, 180)), float(rng.integers(-20, 140))
                scale = float(rng.integers(10, 250))
            else:
                cx, cy = rng.uniform(-30, 190), rng.uniform(-30, 150)
                scale = rng.uniform(5.0, 260.0)
            inst_id = int(rng.integers(0, 6))
            res = npp.train_sample(dp, mp, inst_id, (cx, cy), scale, o)
            assert res is not None
            roi_depth, roi_mask, roi_coord, c_depth, c_both = res
            w_depth, w_mask, w_coord = _python_train_crops(dp, mp, inst_id,
                                                           (cx, cy), scale, o)
            np.testing.assert_array_equal(roi_depth, w_depth,
                                          err_msg=f"depth trial {trial}")
            np.testing.assert_array_equal(roi_mask, w_mask,
                                          err_msg=f"mask trial {trial}")
            np.testing.assert_array_equal(roi_coord, w_coord,
                                          err_msg=f"coord trial {trial}")
            assert c_depth == int(np.sum(w_depth > 0))
            assert c_both == int(np.sum((w_mask > 0) & (w_depth > 0)))

    def test_bgr_mask_png(self, tmp_path, rng):
        # 3-channel mask file: the pipeline reads cv2-BGR channel 2
        h, w = 90, 110
        bgr = rng.integers(0, 5, (h, w, 3)).astype(np.uint8)
        mp = str(tmp_path / "m3.png")
        cv2.imwrite(mp, bgr)
        dp = str(tmp_path / "d.png")
        _write_depth16(tmp_path / "d.png", rng, h, w)
        res = npp.train_sample(dp, mp, 2, (55.0, 45.0), 80.0, 64)
        w_depth, w_mask, w_coord = _python_train_crops(dp, mp, 2, (55.0, 45.0),
                                                       80.0, 64)
        np.testing.assert_array_equal(res[1], w_mask)

    def test_missing_files(self, tmp_path, rng):
        dp = str(tmp_path / "d.png")
        _write_depth16(tmp_path / "d.png", rng)
        assert npp.train_sample(str(tmp_path / "no.png"), dp, 1, (10, 10), 40, 64) is None
        assert npp.train_sample(dp, str(tmp_path / "no.png"), 1, (10, 10), 40, 64) is None


class TestEvalCrops:
    def test_matches_cv2_strided_masks(self, tmp_path, rng):
        h, w, n_inst, o = 120, 160, 4, 128
        depth = _write_depth16(tmp_path / "d.png", rng, h, w)
        masks = rng.random((h, w, n_inst)) > 0.6  # bool, like pred_masks
        coord_2d = iu.get_2d_coord(w, h)
        cols, centers, scales = [], [], []
        for j in range(n_inst):
            cols.append(j)
            centers.append((rng.uniform(0, w), rng.uniform(0, h)))
            scales.append(float(rng.integers(20, 200)))
        res = npp.eval_crops(depth, masks, cols, centers, scales, o, n_threads=2)
        assert res is not None
        roi_depths, roi_masks, roi_coords, counts = res
        for i, j in enumerate(cols):
            wd = iu.crop_resize_by_warp_affine(depth.astype(np.float32),
                                               centers[i], scales[i], o)
            wm = iu.crop_resize_by_warp_affine(masks[:, :, j].astype(np.float32),
                                               centers[i], scales[i], o)
            wc = iu.crop_resize_by_warp_affine(coord_2d.transpose(1, 2, 0),
                                               centers[i], scales[i],
                                               o).transpose(2, 0, 1)
            np.testing.assert_array_equal(roi_depths[i], wd)
            np.testing.assert_array_equal(roi_masks[i], wm)
            np.testing.assert_array_equal(roi_coords[i], wc)
            assert counts[i, 0] == int(np.sum(wd > 0))
            assert counts[i, 1] == int(np.sum((wm > 0) & (wd > 0)))

    def test_empty_and_bad_dtype(self, tmp_path, rng):
        depth = np.zeros((10, 10), np.uint16)
        out = npp.eval_crops(depth, np.zeros((10, 10, 2), np.uint8), [], [], [], 32)
        assert out is not None and out[0].shape == (0, 32, 32)
        assert npp.eval_crops(depth, np.zeros((10, 10, 2), np.float32),
                              [0], [(5, 5)], [8.0], 32) is None


class TestPipelineIntegration:
    """Native on vs off must be invisible end-to-end: identical train samples
    (host and device modes) and identical eval images on the synthetic tree."""

    def test_train_samples_identical(self, data_cfg):
        import dataclasses
        from hspose_tpu.data.dataset import PoseTrainDataset
        cfg_cv2 = dataclasses.replace(data_cfg, native_preproc=False)
        for mode in ("host", "device"):
            ds_n = PoseTrainDataset(data_cfg, sample_mode=mode)
            ds_c = PoseTrainDataset(cfg_cv2, sample_mode=mode)
            for idx in range(len(ds_n)):
                for seed in (0, 1):
                    s_n = ds_n.get_sample(idx, np.random.default_rng(seed))
                    s_c = ds_c.get_sample(idx, np.random.default_rng(seed))
                    assert (s_n is None) == (s_c is None)
                    if s_n is None:
                        continue
                    assert s_n.keys() == s_c.keys()
                    for k in s_n:
                        np.testing.assert_array_equal(
                            s_n[k], s_c[k], err_msg=f"{mode} idx={idx} key={k}")

    def test_eval_images_identical(self, data_cfg):
        import dataclasses
        from hspose_tpu.evaluation.eval_dataset import PoseEvalDataset
        cfg_cv2 = dataclasses.replace(data_cfg, native_preproc=False)
        for mode in ("host", "device"):
            ds_n = PoseEvalDataset(data_cfg, sample_mode=mode)
            ds_c = PoseEvalDataset(cfg_cv2, sample_mode=mode)
            rec_n = ds_n.get_image(0, np.random.default_rng(7))
            rec_c = ds_c.get_image(0, np.random.default_rng(7))
            assert (rec_n is None) == (rec_c is None)
            if rec_n is None:
                continue
            for d_n, d_c in zip(rec_n[:2], rec_c[:2]):
                assert d_n.keys() == d_c.keys()
                for k in d_n:
                    np.testing.assert_array_equal(d_n[k], d_c[k],
                                                  err_msg=f"{mode} key={k}")


class TestBackproject:
    def test_matches_numpy_bitexact(self, rng):
        from hspose_tpu.data.dataset import CAMERA_INTRINSICS, REAL_INTRINSICS

        for cam_k in (CAMERA_INTRINSICS, REAL_INTRINSICS):
            for trial in range(10):
                o = int(rng.integers(16, 200))
                depth = (rng.integers(0, 4000, (o, o))
                         * (rng.random((o, o)) > 0.4)).astype(np.float32)
                mask = (rng.random((o, o)) > 0.5).astype(np.float32)
                coord = np.stack([
                    rng.integers(0, 640, (o, o)).astype(np.float32),
                    rng.integers(0, 480, (o, o)).astype(np.float32)])
                got = npp.backproject(depth, cam_k, coord, mask)
                # the numpy reference (fallback body of host_depth_to_pcl)
                fx, fy = cam_k[0, 0], cam_k[1, 1]
                cx, cy = cam_k[0, 2], cam_k[1, 2]
                d = depth.reshape(-1).astype(np.float64)
                valid = ((d > 0) * mask.reshape(-1)) > 0
                d = d[valid]
                xm = coord[0].reshape(-1)[valid]
                ym = coord[1].reshape(-1)[valid]
                want = np.stack(((xm - cx) * d / fx, (ym - cy) * d / fy, d),
                                axis=-1).astype(np.float32)
                assert got.shape == want.shape
                np.testing.assert_array_equal(got, want)

    def test_empty(self):
        got = npp.backproject(np.zeros((8, 8), np.float32),
                              np.eye(3, dtype=np.float32),
                              np.zeros((2, 8, 8), np.float32),
                              np.ones((8, 8), np.float32))
        assert got.shape == (0, 3)

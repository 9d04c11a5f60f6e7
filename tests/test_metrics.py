import os
import sys

import numpy as np
import pytest

from hspose_tpu.evaluation.metrics import (
    compute_ap_from_matches_scores,
    compute_degree_cm_mAP,
    greedy_iou_matches,
    greedy_pose_matches,
)
from hspose_tpu.geometry.symmetry import SYNSET_NAMES

import oracles


def _make_RT(R=None, t=(0, 0, 0)):
    RT = np.eye(4)
    if R is not None:
        RT[:3, :3] = R
    RT[:3, 3] = t
    return RT


def _rot(rng, n):
    A = rng.normal(size=(n, 3, 3))
    Q, _ = np.linalg.qr(A)
    Q *= np.sign(np.linalg.det(Q))[:, None, None]
    return Q


def _result(gt_ids, gt_RTs, gt_scales, pred_ids, pred_RTs, pred_scales, pred_scores,
            handle_vis=None):
    return {
        "gt_class_ids": np.array(gt_ids, np.int32),
        "gt_RTs": np.array(gt_RTs),
        "gt_scales": np.array(gt_scales),
        "gt_handle_visibility": (np.array(handle_vis) if handle_vis is not None
                                 else np.ones(len(gt_ids))),
        "pred_class_ids": np.array(pred_ids, np.int32),
        "pred_bboxes": np.ones((len(pred_ids), 4)),
        "pred_scores": np.array(pred_scores, np.float64),
        "pred_RTs": np.array(pred_RTs),
        "pred_scales": np.array(pred_scales),
    }


class TestGreedyMatchers:
    def test_iou_perfect_match(self):
        overlaps = np.array([[0.9, 0.1], [0.2, 0.8]])
        gt_m, pred_m = greedy_iou_matches(overlaps, np.array([0.5]))
        np.testing.assert_array_equal(gt_m[0], [0, 1])
        np.testing.assert_array_equal(pred_m[0], [0, 1])

    def test_iou_threshold_excludes(self):
        overlaps = np.array([[0.4]])
        gt_m, pred_m = greedy_iou_matches(overlaps, np.array([0.25, 0.5]))
        assert pred_m[0, 0] == 0  # matched at 0.25
        assert pred_m[1, 0] == -1  # excluded at 0.5

    def test_iou_greedy_order_by_score(self):
        # two preds (already score-sorted), one gt: first pred takes it
        overlaps = np.array([[0.8], [0.9]])
        gt_m, pred_m = greedy_iou_matches(overlaps, np.array([0.5]))
        assert gt_m[0, 0] == 0
        assert pred_m[0, 1] == -1

    def test_pose_thresholds_grid(self):
        errors = np.array([[[4.0, 1.5]]])  # 4 deg, 1.5 cm
        gt_m, pred_m = greedy_pose_matches(errors, [2, 5, 10], [1, 2, 5])
        want = np.array([[[-1], [-1], [-1]],
                         [[-1], [0], [0]],
                         [[-1], [0], [0]]], dtype=float)
        np.testing.assert_array_equal(gt_m, want)

    def test_pose_nan_always_matches(self):
        errors = np.array([[[np.nan, np.nan]]])
        gt_m, _ = greedy_pose_matches(errors, [5], [2])
        assert gt_m[0, 0, 0] == 0

    def test_pose_picks_smallest_sum(self):
        errors = np.array([[[3.0, 1.0], [1.0, 0.5]]])  # pred prefers gt 1
        gt_m, pred_m = greedy_pose_matches(errors, [10], [5])
        assert pred_m[0, 0, 0] == 1


class TestAP:
    def test_perfect(self):
        ap = compute_ap_from_matches_scores(np.array([0, 1]), np.array([0.9, 0.8]),
                                            np.array([0, 1]))
        assert ap == 1.0

    def test_half_recall(self):
        ap = compute_ap_from_matches_scores(np.array([0]), np.array([0.9]),
                                            np.array([0, -1]))
        assert abs(ap - 0.5) < 1e-9

    def test_false_positive_before_tp(self):
        # higher-scored FP then TP: precision at recall 1 is 0.5
        ap = compute_ap_from_matches_scores(np.array([-1, 0]), np.array([0.9, 0.8]),
                                            np.array([1]))
        assert abs(ap - 0.5) < 1e-9


class TestEndToEndMAP:
    def test_perfect_predictions_give_ap_one(self, rng):
        results = []
        for _ in range(3):
            R = _rot(rng, 2)
            RTs = [_make_RT(R[0], (0.1, 0, 0.5)), _make_RT(R[1], (-0.2, 0.1, 0.8))]
            scales = [[0.1, 0.2, 0.1], [0.2, 0.1, 0.2]]
            results.append(_result([1, 3], RTs, scales, [1, 3], RTs, scales,
                                   [0.99, 0.95]))
        iou_aps, pose_aps = compute_degree_cm_mAP(
            results, SYNSET_NAMES, None, degree_thresholds=[5, 10],
            shift_thresholds=[2, 5], iou_3d_thresholds=[0.1, 0.25, 0.5, 0.75],
            iou_pose_thres=0.1, use_matches_for_pose=True)
        # classes 1 (bottle) and 3 (camera) perfect; others zero
        assert iou_aps[1, :].min() == 1.0
        assert iou_aps[3, :].min() == 1.0
        assert pose_aps[1].min() == 1.0
        assert pose_aps[3].min() == 1.0
        assert iou_aps[2, 0] == 0.0

    def test_symmetric_y_rotation_is_free(self, rng):
        # bottle rotated about its own y axis: still perfect IoU and 0° error
        R = _rot(rng, 1)[0]
        ry = oracles.rodrigues(np.array([0, 1, 0.0]), 1.1)
        gt_RT = _make_RT(R, (0, 0, 0.6))
        pred_RT = _make_RT(R @ ry, (0, 0, 0.6))
        scales = [[0.08, 0.2, 0.08]]
        res = _result([1], [gt_RT], scales, [1], [pred_RT], scales, [0.9])
        iou_aps, pose_aps = compute_degree_cm_mAP(
            [res], SYNSET_NAMES, None, degree_thresholds=[5],
            shift_thresholds=[2], iou_3d_thresholds=[0.1, 0.75],
            iou_pose_thres=0.1, use_matches_for_pose=True)
        assert iou_aps[1, 1] > 0.99  # IoU@0.75 despite the rotation
        assert pose_aps[1, 0, 0] == 1.0  # 5°2cm

    def test_camera_rotation_is_not_free(self, rng):
        R = _rot(rng, 1)[0]
        ry = oracles.rodrigues(np.array([0, 1, 0.0]), 1.1)  # 63°
        gt_RT = _make_RT(R, (0, 0, 0.6))
        pred_RT = _make_RT(R @ ry, (0, 0, 0.6))
        scales = [[0.1, 0.1, 0.15]]
        res = _result([3], [gt_RT], scales, [3], [pred_RT], scales, [0.9])
        _, pose_aps = compute_degree_cm_mAP(
            [res], SYNSET_NAMES, None, degree_thresholds=[5],
            shift_thresholds=[2], iou_3d_thresholds=[0.1],
            iou_pose_thres=0.1, use_matches_for_pose=True)
        assert pose_aps[3, 0, 0] == 0.0

    def test_mug_handle_visibility_controls_symmetry(self, rng):
        R = np.eye(3)
        ry = oracles.rodrigues(np.array([0, 1, 0.0]), 0.8)
        gt_RT = _make_RT(R, (0, 0, 0.6))
        pred_RT = _make_RT(R @ ry, (0, 0, 0.6))
        scales = [[0.12, 0.1, 0.12]]
        for handle, expect in [(0, 1.0), (1, 0.0)]:
            res = _result([6], [gt_RT], scales, [6], [pred_RT], scales, [0.9],
                          handle_vis=[handle])
            _, pose_aps = compute_degree_cm_mAP(
                [res], SYNSET_NAMES, None, degree_thresholds=[5],
                shift_thresholds=[5], iou_3d_thresholds=[0.1],
                iou_pose_thres=0.1, use_matches_for_pose=True)
            assert pose_aps[6, 0, 0] == expect, handle


REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
class TestReferenceParity:
    def test_map_matches_reference(self, rng, tmp_path):
        sys.path.insert(0, REF)
        import types
        # eval_utils_v1 imports skimage.color but never uses it on the mAP path
        skimage = types.ModuleType("skimage")
        skimage.color = types.ModuleType("skimage.color")
        sys.modules.setdefault("skimage", skimage)
        sys.modules.setdefault("skimage.color", skimage.color)
        import matplotlib
        matplotlib.use("Agg")
        from evaluation.eval_utils_v1 import compute_degree_cm_mAP as ref_map

        results = []
        for i in range(6):
            n_gt = int(rng.integers(1, 4))
            n_pred = int(rng.integers(0, 5))
            gt_ids = rng.integers(1, 7, n_gt)
            pred_ids = rng.integers(1, 7, n_pred)
            gt_R = _rot(rng, n_gt)
            pred_R = _rot(rng, max(n_pred, 1))[:n_pred]
            gt_RTs = np.array([_make_RT(gt_R[j], rng.normal(scale=0.3, size=3))
                               for j in range(n_gt)])
            pred_RTs = np.array([_make_RT(pred_R[j], rng.normal(scale=0.3, size=3))
                                 for j in range(n_pred)]).reshape(n_pred, 4, 4)
            # make some predictions close to gts
            for j in range(min(n_gt, n_pred)):
                if rng.random() < 0.7:
                    pred_RTs[j] = gt_RTs[j].copy()
                    pred_RTs[j][:3, 3] += rng.normal(scale=0.01, size=3)
                    pred_ids[j] = gt_ids[j]
            gt_scales = rng.uniform(0.05, 0.3, (n_gt, 3))
            pred_scales = (gt_scales[:n_pred].copy() if n_pred <= n_gt else
                           rng.uniform(0.05, 0.3, (n_pred, 3)))
            results.append(_result(gt_ids, gt_RTs, gt_scales, pred_ids, pred_RTs,
                                   pred_scales, rng.random(n_pred),
                                   handle_vis=rng.integers(0, 2, n_gt)))

        degree_list = list(range(0, 16, 5))
        shift_list = [0, 2, 5, 10]
        iou_list = [0.1, 0.25, 0.5, 0.75]

        ref_iou, ref_pose = ref_map(
            [dict(r) for r in results], list(SYNSET_NAMES), str(tmp_path),
            degree_list, shift_list, iou_list, iou_pose_thres=0.1,
            use_matches_for_pose=True, plot_figure=False)
        our_iou, our_pose = compute_degree_cm_mAP(
            results, SYNSET_NAMES, None, degree_list, shift_list, iou_list,
            iou_pose_thres=0.1, use_matches_for_pose=True)

        np.testing.assert_allclose(our_iou, ref_iou, atol=1e-9)
        np.testing.assert_allclose(our_pose, ref_pose, atol=1e-9)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
class TestLegacyReferenceParity:
    """Fuzz parity for the LEGACY buffered compute_mAP (eval_utils.py:296-464)."""

    def _fuzz_results(self, rng, n_images=6):
        results = []
        for _ in range(n_images):
            n_gt = int(rng.integers(1, 4))
            n_pred = int(rng.integers(0, 5))
            gt_ids = rng.integers(1, 7, n_gt)
            pred_ids = rng.integers(1, 7, n_pred)
            gt_R = _rot(rng, n_gt)
            pred_R = _rot(rng, max(n_pred, 1))[:n_pred]
            gt_RTs = np.array([_make_RT(gt_R[j], rng.normal(scale=0.3, size=3))
                               for j in range(n_gt)])
            pred_RTs = np.array([_make_RT(pred_R[j], rng.normal(scale=0.3, size=3))
                                 for j in range(n_pred)]).reshape(n_pred, 4, 4)
            for j in range(min(n_gt, n_pred)):
                if rng.random() < 0.7:
                    pred_RTs[j] = gt_RTs[j].copy()
                    pred_RTs[j][:3, 3] += rng.normal(scale=0.01, size=3)
                    pred_ids[j] = gt_ids[j]
            gt_scales = rng.uniform(0.05, 0.3, (n_gt, 3))
            pred_scales = (gt_scales[:n_pred].copy() if n_pred <= n_gt else
                           rng.uniform(0.05, 0.3, (n_pred, 3)))
            results.append(_result(gt_ids, gt_RTs, gt_scales, pred_ids, pred_RTs,
                                   pred_scales, rng.random(n_pred),
                                   handle_vis=rng.integers(0, 2, n_gt)))
        return results

    @pytest.mark.parametrize("use_matches_for_pose", [False, True])
    def test_legacy_map_matches_reference(self, rng, tmp_path,
                                          use_matches_for_pose):
        sys.path.insert(0, REF)
        from evaluation.eval_utils import compute_mAP as ref_map

        from hspose_tpu.evaluation.metrics_legacy import compute_mAP

        results = self._fuzz_results(rng)
        degree_list = [5, 10, 15]
        shift_list = [2, 5, 10]
        iou_list = [0.1, 0.25, 0.5]

        ref_out = ref_map([dict(r) for r in results], str(tmp_path),
                          degree_list, shift_list, iou_list,
                          iou_pose_thres=0.25,
                          use_matches_for_pose=use_matches_for_pose)
        our_out = compute_mAP(results, None, degree_list, shift_list, iou_list,
                              iou_pose_thres=0.25,
                              use_matches_for_pose=use_matches_for_pose)
        for name, a, b in zip(("iou_aps", "pose_aps", "iou_acc", "pose_acc"),
                              our_out, ref_out):
            np.testing.assert_allclose(a, b, atol=1e-9, equal_nan=True,
                                       err_msg=name)

    def test_legacy_cls_ids_subset(self, rng, tmp_path):
        """cls_ids subsets: unevaluated classes still contribute the
        reference's buffer artifacts to the mean rows — IoU ap/acc 1.0 (AP
        over the untrimmed 30000-zero match buffers, eval_utils.py:433-439)
        and pose rows 0 — replicated exactly; do NOT 'fix' to 0/NaN."""
        sys.path.insert(0, REF)
        from evaluation.eval_utils import compute_mAP as ref_map

        from hspose_tpu.evaluation.metrics_legacy import compute_mAP

        results = self._fuzz_results(rng, n_images=4)
        ref_out = ref_map([dict(r) for r in results], str(tmp_path),
                          [10], [5], [0.25], cls_ids=[1, 3, 6])
        our_out = compute_mAP(results, None, [10], [5], [0.25],
                              cls_ids=[1, 3, 6])
        for name, a, b in zip(("iou_aps", "pose_aps", "iou_acc", "pose_acc"),
                              our_out, ref_out):
            np.testing.assert_allclose(a, b, atol=1e-9, equal_nan=True,
                                       err_msg=name)

    def test_legacy_writes_pkl(self, rng, tmp_path):
        from hspose_tpu.evaluation.metrics_legacy import compute_mAP

        out = compute_mAP(self._fuzz_results(rng, 2), str(tmp_path), [10], [5],
                          [0.25])
        import pickle
        with open(tmp_path / "mAP_Acc.pkl", "rb") as f:
            blob = pickle.load(f)
        np.testing.assert_array_equal(blob["iou_aps"], out[0])
        np.testing.assert_array_equal(blob["pose_aps"], out[1])

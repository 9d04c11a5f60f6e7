"""Tests for the legacy-NOCS visualization helpers (evaluation/eval_utils.py
:467-613 equivalents): align_rotation parity + y-invariance, box overlay
rendering, and the compact 3-panel mAP figure."""

import os
import sys

import numpy as np
import pytest

from hspose_tpu.evaluation.visualize import (
    align_rotation,
    calculate_2d_projections,
    draw_detections,
    plot_mAP,
)

REF = "/root/reference"


def _random_sRT(rng, scale=1.3):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    Q *= np.sign(np.linalg.det(Q))
    sRT = np.eye(4)
    sRT[:3, :3] = scale * Q
    sRT[:3, 3] = rng.normal(scale=0.3, size=3) + [0, 0, 1.5]
    return sRT


def _y_rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    R = np.eye(4)
    R[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    return R


def test_align_rotation_y_invariant(rng):
    """Canonicalization absorbs any pre-composed y-rotation (the symmetric
    object's free axis)."""
    sRT = _random_sRT(rng)
    base = align_rotation(sRT)
    for theta in [0.3, 1.2, 2.9, -1.1]:
        spun = sRT @ _y_rot(theta)
        np.testing.assert_allclose(align_rotation(spun), base, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
def test_align_rotation_matches_reference(rng):
    sys.path.insert(0, REF)
    from evaluation.eval_utils import align_rotation as ref_align
    from evaluation.eval_utils import calculate_2d_projections as ref_proj

    for _ in range(5):
        sRT = _random_sRT(rng)
        np.testing.assert_allclose(align_rotation(sRT), ref_align(sRT),
                                   rtol=1e-6, atol=1e-7)
    pts = rng.normal(size=(3, 17)) + np.array([[0], [0], [3.0]])
    K = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]])
    np.testing.assert_array_equal(calculate_2d_projections(pts, K),
                                  ref_proj(pts, K))


def test_draw_detections_writes_overlay(rng, tmp_path):
    img = np.zeros((480, 640, 3), np.uint8)
    K = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]])
    sRT = np.stack([_random_sRT(rng), _random_sRT(rng)])
    sizes = np.abs(rng.normal(size=(2, 3))) * 0.1 + 0.1
    out = draw_detections(img, str(tmp_path), "real_test", 7, K,
                          sRT, sizes, [1, 3],
                          gt_sRT=sRT, gt_size=sizes, gt_class_ids=[1, 3])
    assert os.path.exists(out)
    import cv2

    written = cv2.imread(out)
    assert written is not None and written.any(), "overlay drew nothing"


def test_plot_map_figure(tmp_path, rng):
    n_cls = 8  # BG + 6 + mean
    iou_aps = rng.uniform(size=(n_cls, 11))
    pose_aps = rng.uniform(size=(n_cls, 7, 5))
    out = plot_mAP(iou_aps, pose_aps, str(tmp_path),
                   iou_thres_list=np.linspace(0, 1, 11),
                   degree_thres_list=list(range(0, 61, 10)),
                   shift_thres_list=[0, 2.5, 5, 7.5, 10])
    assert os.path.exists(out)

"""Native C++ matcher vs numpy implementation: must agree exactly."""

import numpy as np
import pytest

from hspose_tpu.evaluation.metrics import greedy_iou_matches, greedy_pose_matches
from hspose_tpu.evaluation.native_matcher import (
    get_lib,
    greedy_iou_matches_native,
    greedy_pose_matches_native,
)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native matcher unavailable (no g++?)")


def test_iou_matcher_fuzz(rng):
    for _ in range(200):
        P = int(rng.integers(0, 6))
        G = int(rng.integers(0, 5))
        overlaps = rng.random((P, G))
        overlaps[rng.random((P, G)) < 0.1] = np.nan
        thr = np.sort(rng.random(7))
        want = greedy_iou_matches(overlaps, thr)
        got = greedy_iou_matches_native(overlaps, thr)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


def test_pose_matcher_fuzz(rng):
    for _ in range(200):
        P = int(rng.integers(0, 6))
        G = int(rng.integers(0, 5))
        errors = np.stack([rng.random((P, G)) * 30, rng.random((P, G)) * 10], -1)
        errors[rng.random((P, G)) < 0.1] = np.nan
        deg = np.sort(rng.random(5) * 30)
        cm = np.sort(rng.random(4) * 10)
        want = greedy_pose_matches(errors, deg, cm)
        got = greedy_pose_matches_native(errors, deg, cm)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


def test_native_faster_on_large_grid(rng):
    import time
    P, G = 8, 6
    errors = np.stack([rng.random((P, G)) * 30, rng.random((P, G)) * 10], -1)
    deg = np.arange(61, dtype=np.float64)
    cm = np.arange(21, dtype=np.float64) / 2

    t0 = time.perf_counter()
    for _ in range(50):
        greedy_pose_matches(errors, deg, cm)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(50):
        greedy_pose_matches_native(errors, deg, cm)
    t_native = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)

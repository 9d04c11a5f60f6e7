"""Eval-dataset parity vs the reference ``evaluation/load_data_eval.PoseDataset``.

Covers VERDICT round-1 item 5: the CAMERA source must key mean-shape/symmetry
lookups by ShapeNet synset (load_data_eval.py:69-76,361-384 — note get_sym_info
falls through to no-symmetry for synset names, :435-436), and the per-obj filter
quirk (:82-83: active only for Real and ``per_obj != 'can'``).

The reference class is imported and driven directly over a synthetic NOCS tree;
the sampled point clouds can't be compared element-wise (both sides draw a random
subset), so the pipeline is checked by (a) exact equality of the deterministic
outputs (cat ids, sym_info, mean_shape) and (b) set-membership of our sampled
cloud inside the reference's *unsampled* back-projected cloud (sampling patched to
identity on the reference side).
"""

import os
import pickle
import sys

import numpy as np
import pytest

from hspose_tpu.config import DataConfig
from hspose_tpu.evaluation.eval_dataset import PoseEvalDataset

from test_data_pipeline import _write_scene

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import absl.flags as aflags

    if not aflags.FLAGS.is_parsed():
        import config.config  # noqa: F401
        aflags.FLAGS(["test"])
    # the reference uses numpy aliases removed in numpy>=1.24
    for name, repl in [("float", float), ("bool", bool), ("int", int)]:
        if not hasattr(np, name):
            setattr(np, name, repl)
    # load_data_eval imports eval_utils_v1, which imports skimage.color but
    # never uses it on this path
    import types

    _sk = types.ModuleType("skimage")
    _sk.color = types.ModuleType("skimage.color")
    sys.modules.setdefault("skimage", _sk)
    sys.modules.setdefault("skimage.color", _sk.color)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """NOCS tree with one Real test image (1 instance) and one CAMERA val image."""
    root = str(tmp_path_factory.mktemp("nocs_eval") / "NOCS")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)

    _write_scene(root, "test", "scene_2", "0000", [2], with_detections=True)
    with open(os.path.join(root, "Real", "test_list.txt"), "w") as f:
        f.write("test/scene_2/0000\n")

    _write_scene(root, "val", "00001", "0000", [1, 5], with_detections=True,
                 source="CAMERA")
    # single-instance image for the identity-sampling parity check (multiple
    # instances give ragged full clouds the reference can't stack)
    _write_scene(root, "val", "00002", "0000", [3], with_detections=True,
                 source="CAMERA")
    with open(os.path.join(root, "CAMERA", "val_list.txt"), "w") as f:
        f.write("val/00001/0000\nval/00002/0000\n")

    models = {f"model_{c}": rng.normal(scale=0.2, size=(64, 3)).astype(np.float32)
              for c in range(1, 7)}
    os.makedirs(os.path.join(root, "obj_models"), exist_ok=True)
    for name in ["real_test.pkl", "camera_val.pkl"]:
        with open(os.path.join(root, "obj_models", name), "wb") as f:
            pickle.dump(models, f)
    with open(os.path.join(root, "obj_models", "mug_meta.pkl"), "wb") as f:
        pickle.dump({f"model_{c}": (np.zeros(3, np.float32), 1.0)
                     for c in range(1, 7)}, f)
    return root


def _ref_dataset(tree, source):
    from evaluation.load_data_eval import PoseDataset as RefPoseDataset

    aflags.FLAGS.dataset_dir = tree
    aflags.FLAGS.detection_dir = os.path.join(os.path.dirname(tree),
                                              "segmentation_results")
    aflags.FLAGS.per_obj = ""
    return RefPoseDataset(source=source, mode="test")


def _our_cfg(tree, dataset, per_obj=""):
    return DataConfig(dataset=dataset, dataset_dir=tree, per_obj=per_obj,
                      detection_dir=os.path.join(os.path.dirname(tree),
                                                 "segmentation_results"),
                      num_workers=0)


@pytest.mark.parametrize("source,index", [("Real", 0), ("CAMERA", 1)])
def test_eval_pipeline_parity(tree, source, index):
    ref = _ref_dataset(tree, source)
    # identity sampling -> the full back-projected cloud (only valid on the
    # single-instance images, where np.array() stays rectangular)
    ref._sample_points = lambda pcl, n: pcl
    ref_data, ref_det, _ = ref[index]

    ours = PoseEvalDataset(_our_cfg(tree, source))
    our_data, our_det, _ = ours.get_image(index, np.random.default_rng(0))

    np.testing.assert_array_equal(np.asarray(ref_data["cat_id"]), our_data["cat_id"])
    np.testing.assert_array_equal(np.asarray(ref_data["sym_info"]),
                                  our_data["sym_info"])
    np.testing.assert_allclose(np.asarray(ref_data["mean_shape"]),
                               our_data["mean_shape"], rtol=0, atol=1e-7)
    np.testing.assert_array_equal(ref_det["pred_scores"], our_det["pred_scores"])

    # every sampled point must be a member of the reference's full cloud (the
    # reference back-projects in float64 before the float32 cast, so allow
    # one-ulp noise via a nearest-neighbour distance instead of set membership)
    from scipy.spatial import cKDTree

    ref_pcl = np.asarray(ref_data["pcl_in"])  # (n_inst, Nfull, 3)
    for i in range(ref_pcl.shape[0]):
        tree_i = cKDTree(ref_pcl[i])
        d, _ = tree_i.query(our_data["pcl_in"][i])
        assert d.max() < 1e-6, f"instance {i}: sampled point {d.max()} from ref cloud"
        assert our_data["pcl_in"][i].shape[0] == 1028


def test_camera_uses_synset_tables(tree):
    """CAMERA mean shapes are the /4 synset extents; sym_info is all-zero."""
    ours = PoseEvalDataset(_our_cfg(tree, "CAMERA"))
    data, _, _ = ours.get_image(0, np.random.default_rng(0))
    # instances are classes [1 bottle, 5 laptop] -> synsets 02876657, 03642806
    np.testing.assert_allclose(
        data["mean_shape"],
        np.array([[324, 874, 321], [581, 445, 672]], np.float32) / 4 / 1000.0,
        atol=1e-7)
    np.testing.assert_array_equal(data["sym_info"], np.zeros((2, 4)))


def test_per_obj_quirk(tree):
    """per_obj activates only for Real and non-can (load_data_eval.py:82-83)."""
    assert PoseEvalDataset(_our_cfg(tree, "Real", per_obj="can")).per_obj_id is None
    assert PoseEvalDataset(_our_cfg(tree, "CAMERA", per_obj="bottle")).per_obj_id is None
    ds = PoseEvalDataset(_our_cfg(tree, "Real", per_obj="bowl"))
    assert ds.per_obj_id == 2
    assert len(ds) == 1  # the test image contains a bowl -> kept
    ds2 = PoseEvalDataset(_our_cfg(tree, "Real", per_obj="laptop"))
    assert len(ds2) == 0  # no laptop in the Real test image -> filtered out

"""End-to-end slices: eval harness over the synthetic dataset, and a short
training run that actually reduces the loss."""

import dataclasses
import os

import numpy as np
import pytest

from hspose_tpu.config import default_config

from test_data_pipeline import nocs_root, data_cfg  # noqa: F401  (fixtures)


@pytest.fixture
def small_cfg(data_cfg):
    cfg = default_config()
    cfg = cfg.replace(data=dataclasses.replace(data_cfg, num_points=128))
    return cfg


class TestEvalHarness:
    def test_batched_inference_to_map(self, small_cfg, tmp_path):
        import jax
        from hspose_tpu.evaluation.evaluate import (
            batched_pose_inference,
            load_eval_images,
        )
        from hspose_tpu.evaluation.metrics import compute_degree_cm_mAP
        from hspose_tpu.geometry.symmetry import SYNSET_NAMES
        from hspose_tpu.models.hspose import build_model

        cfg = small_cfg.replace(eval=dataclasses.replace(small_cfg.eval, eval_batch=4))
        records = load_eval_images(cfg, seed=0, num_workers=2)
        assert len(records) == 1

        model = build_model(cfg)
        import jax.numpy as jnp
        variables = model.init(
            {"params": jax.random.key(0), "pool": jax.random.key(1),
             "dropout": jax.random.key(2)},
            jnp.zeros((1, 128, 3), jnp.float32), jnp.zeros((1,), jnp.int32), True)

        pred_results, cps = batched_pose_inference(
            cfg, model, variables["params"], variables["batch_stats"], records, 0)
        assert len(pred_results) == 1
        det = pred_results[0]
        assert det["pred_RTs"].shape == (2, 4, 4)
        assert det["pred_scales"].shape == (2, 3)
        # homogeneous row intact
        np.testing.assert_allclose(det["pred_RTs"][:, 3], [[0, 0, 0, 1]] * 2)

        # metric over the filled detections
        for (data, d, gts), det_out in zip(records, pred_results):
            for k in ["gt_class_ids", "gt_RTs", "gt_scales", "gt_handle_visibility"]:
                det_out.setdefault(k, gts[k])
        iou_aps, pose_aps = compute_degree_cm_mAP(
            pred_results, SYNSET_NAMES, str(tmp_path), degree_thresholds=[5, 10],
            shift_thresholds=[2, 5], iou_3d_thresholds=[0.1, 0.25],
            iou_pose_thres=0.1, use_matches_for_pose=True)
        assert iou_aps.shape == (8, 2)
        assert np.all((iou_aps >= 0) | np.isnan(iou_aps))


class TestEvalRecon:
    def test_recon_metrics_produced(self, small_cfg, tmp_path):
        """eval.recon=true wires chamfer_dis_cass / emd_dis_cass end-to-end
        (the eval_recon producer the reference never shipped,
        eval_utils_v1.py:672-707)."""
        import jax
        import jax.numpy as jnp
        from hspose_tpu.evaluation.evaluate import (
            batched_pose_inference,
            load_eval_images,
        )
        from hspose_tpu.evaluation.metrics import aggregate_recon_metrics
        from hspose_tpu.geometry.symmetry import SYNSET_NAMES
        from hspose_tpu.models.hspose import build_model

        cfg = small_cfg.replace(
            eval=dataclasses.replace(small_cfg.eval, eval_batch=4, recon=True))
        records = load_eval_images(cfg, seed=0, num_workers=2)

        model = build_model(cfg)
        variables = model.init(
            {"params": jax.random.key(0), "pool": jax.random.key(1),
             "dropout": jax.random.key(2)},
            jnp.zeros((1, 128, 3), jnp.float32), jnp.zeros((1,), jnp.int32), True)

        pred_results, _ = batched_pose_inference(
            cfg, model, variables["params"], variables["batch_stats"], records, 0)
        det = pred_results[0]
        assert det["chamfer_dis_cass"].shape == (2,)
        assert det["emd_dis_cass"].shape == (2,)
        # untrained recon vs observed cloud: finite, strictly positive
        assert np.all(np.isfinite(det["chamfer_dis_cass"]))
        assert np.all(det["chamfer_dis_cass"] > 0)
        assert np.all(np.isfinite(det["emd_dis_cass"]))
        assert np.all(det["emd_dis_cass"] > 0)

        stats = aggregate_recon_metrics(pred_results, SYNSET_NAMES)
        assert "mean" in stats["cmf"] and stats["cmf"]["mean"] > 0
        assert "mean" in stats["emd"] and stats["emd"]["mean"] > 0


class TestTrainingReducesLoss:
    def test_loss_decreases_on_fixed_batch(self, rng):
        import jax
        import jax.numpy as jnp
        from hspose_tpu.engine.train_step import build_train_step
        from hspose_tpu.models.hspose import build_model
        from test_checkpoint import _fake_batch

        cfg = default_config()
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_points=128),
                          optim=dataclasses.replace(cfg.optim, lr=1e-3,
                                                    warmup_iters=0))
        model = build_model(cfg)
        _, state, train_step = build_train_step(cfg, model, jax.random.key(0))
        batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng, 4, 128).items()}
        key = jax.random.key(1)
        losses = []
        for _ in range(12):
            state, metrics = train_step(state, batch, key)
            losses.append(float(metrics["total_loss"]))
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

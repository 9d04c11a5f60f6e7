"""Fused on-device preprocessing inside the jitted train step (north-star path)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hspose_tpu.config import default_config

from test_data_pipeline import nocs_root, data_cfg  # noqa: F401


def test_train_step_from_roi_crops(data_cfg, rng):
    from hspose_tpu.data.dataset import PoseTrainDataset, train_batches
    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model

    cfg = default_config()
    cfg = cfg.replace(data=dataclasses.replace(data_cfg, num_points=128))
    ds = PoseTrainDataset(cfg.data, sample_mode="device")
    batch = next(iter(train_batches(ds, batch_size=2, steps=1, seed=11,
                                    num_workers=0)))
    assert "pcl_in" not in batch and "roi_depth" in batch

    model = build_model(cfg)
    _, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = train_step(state, jbatch, jax.random.key(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1

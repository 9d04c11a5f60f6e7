"""Data-parallel sharding tests on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import numpy as np
import pytest

from hspose_tpu.config import ParallelConfig, default_config
from hspose_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate_state,
    shard_batch,
)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8, jax.devices()


def test_make_mesh_defaults_to_all_devices():
    mesh = make_mesh(ParallelConfig())
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp",)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(ParallelConfig())
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded["x"]),
                                  batch["x"])


def test_pad_to_multiple():
    batch = {"x": np.arange(10, dtype=np.float32)}
    out = pad_to_multiple(batch, 8)
    assert out["x"].shape[0] == 16
    np.testing.assert_array_equal(out["x"][10:], np.full(6, 9.0))


def test_dp_train_step_matches_single_device(rng):
    """The sharded train step must produce the same numbers as single-device."""
    import dataclasses

    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model
    from test_checkpoint import _fake_batch

    cfg = default_config()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_points=128))
    model = build_model(cfg)
    tx, state0, train_step = build_train_step(cfg, model, jax.random.key(0))
    host_state = jax.device_get(state0)  # master copy: train_step donates its input
    batch = {k: jax.numpy.asarray(v) for k, v in _fake_batch(rng, 8, 128).items()}
    key = jax.random.key(9)

    # single device
    state_a, metrics_a = train_step(
        jax.tree_util.tree_map(jax.numpy.asarray, host_state), batch, key)

    # sharded over the 8-device mesh
    mesh = make_mesh(ParallelConfig())
    state_b0 = replicate_state(mesh, host_state)
    sharded = shard_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})
    state_b, metrics_b = train_step(state_b0, sharded, key)

    np.testing.assert_allclose(float(metrics_a["total_loss"]),
                               float(metrics_b["total_loss"]), rtol=1e-4)
    la = jax.tree_util.tree_leaves(jax.device_get(state_a.params))
    lb = jax.tree_util.tree_leaves(jax.device_get(state_b.params))
    for a, b in zip(la, lb):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_dp_eval_inference_matches_single_device(rng):
    """Batched eval inference sharded over the mesh == single-device numerics."""
    from hspose_tpu.evaluation.evaluate import batched_pose_inference
    from hspose_tpu.models.hspose import build_model

    n_pts = 128
    cfg = default_config()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, num_points=n_pts),
        eval=dataclasses.replace(cfg.eval, eval_batch=8),
    )
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.key(0), "pool": jax.random.key(1),
         "dropout": jax.random.key(2)},
        np.zeros((2, n_pts, 3), np.float32), np.zeros((2,), np.int32), True)

    def record(n_inst, seed):
        r = np.random.default_rng(seed)
        data = {
            "pcl_in": r.normal(scale=0.2, size=(n_inst, n_pts, 3)).astype(np.float32),
            "cat_id_0base": (np.arange(n_inst) % 6).astype(np.int32),
            "sym_info": np.tile(np.array([[0, 1, 0, 0]], np.float32), (n_inst, 1)),
            "mean_shape": np.abs(r.normal(size=(n_inst, 3))).astype(np.float32) * 0.1,
        }
        return (data, {}, {})

    records_a = [record(3, 1), record(5, 2)]
    records_b = [record(3, 1), record(5, 2)]

    cfg_dp1 = cfg.replace(parallel=dataclasses.replace(cfg.parallel, dp=1))
    preds_a, _ = batched_pose_inference(cfg_dp1, model, variables["params"],
                                        variables["batch_stats"], records_a, 0)
    preds_b, _ = batched_pose_inference(cfg, model, variables["params"],
                                        variables["batch_stats"], records_b, 0)
    assert len(jax.devices()) == 8  # dp=8 path actually exercised
    for a, b in zip(preds_a, preds_b):
        np.testing.assert_allclose(a["pred_RTs"], b["pred_RTs"], atol=1e-5)
        np.testing.assert_allclose(a["pred_scales"], b["pred_scales"], atol=1e-6)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)

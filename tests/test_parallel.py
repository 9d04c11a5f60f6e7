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


@pytest.mark.slow
def test_two_process_dp_train(rng):
    """Executable multi-host evidence (SURVEY §5.8 / VERDICT r2 #6): two OS
    processes join via jax.distributed (local coordinator), run the DP train
    step across their combined 4 CPU devices, and must reproduce the
    single-process numerics."""
    import json
    import os
    import socket
    import subprocess
    import sys

    # pick a free port for the coordination service
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)
    result = json.loads(outs[0].strip().splitlines()[-1])

    # single-process reference: same step, same batch, 4-device mesh
    import dataclasses as dc

    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model
    from test_checkpoint import _fake_batch

    cfg = default_config()
    cfg = cfg.replace(data=dc.replace(cfg.data, num_points=128))
    model = build_model(cfg)
    tx, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    mesh = make_mesh(ParallelConfig(dp=4))
    state = replicate_state(mesh, jax.device_get(state))
    batch = shard_batch(mesh, _fake_batch(np.random.default_rng(0), 8, 128))
    key = jax.random.key(9)
    losses = []
    for _ in range(2):
        state, metrics = train_step(state, batch, key)
        losses.append(float(metrics["total_loss"]))
    param_sum = float(sum(float(np.sum(np.abs(np.asarray(x))))
                          for x in jax.tree_util.tree_leaves(
                              jax.device_get(state.params))))

    np.testing.assert_allclose(result["losses"], losses, rtol=1e-5)
    np.testing.assert_allclose(result["param_sum"], param_sum, rtol=1e-5)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_2d_mesh_tp_train_step_matches_single_device(rng):
    """2-D (dp, mp) mesh: Dense output channels sharded over mp, batch over
    dp — must reproduce single-device numerics (the collectives XLA inserts
    are exact)."""
    import dataclasses as dc

    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model
    from hspose_tpu.parallel.mesh import shard_state, state_sharding
    from jax.sharding import PartitionSpec as P
    from test_checkpoint import _fake_batch

    cfg = default_config()
    cfg = cfg.replace(data=dc.replace(cfg.data, num_points=128))
    model = build_model(cfg)
    tx, state0, train_step = build_train_step(cfg, model, jax.random.key(0))
    host_state = jax.device_get(state0)
    batch = {k: jax.numpy.asarray(v) for k, v in _fake_batch(rng, 8, 128).items()}
    key = jax.random.key(9)

    state_a, metrics_a = train_step(
        jax.tree_util.tree_map(jax.numpy.asarray, host_state), batch, key)

    mesh = make_mesh(ParallelConfig(dp=4, mp=2))
    assert mesh.axis_names == ("dp", "mp")
    # the rule must actually shard something: the 1024-wide head kernels
    specs = jax.tree_util.tree_leaves(
        state_sharding(mesh, host_state.params),
        is_leaf=lambda x: hasattr(x, "spec"))
    assert any(s.spec == P(None, "mp") for s in specs)

    state_b0 = shard_state(mesh, host_state)
    sharded = shard_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})
    state_b, metrics_b = train_step(state_b0, sharded, key)

    np.testing.assert_allclose(float(metrics_a["total_loss"]),
                               float(metrics_b["total_loss"]), rtol=1e-4)
    la = jax.tree_util.tree_leaves(jax.device_get(state_a.params))
    lb = jax.tree_util.tree_leaves(jax.device_get(state_b.params))
    for a, b in zip(la, lb):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_2d_mesh_eval_inference_matches_single_device(rng):
    """Eval inference on a dp=2 x mp=2 mesh (heads tensor-sharded) must match
    the single-device numerics."""
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

    cfg_dp1 = cfg.replace(parallel=dataclasses.replace(cfg.parallel, dp=1))
    preds_a, _ = batched_pose_inference(cfg_dp1, model, variables["params"],
                                        variables["batch_stats"],
                                        [record(3, 1), record(5, 2)], 0)
    cfg_2d = cfg.replace(parallel=dataclasses.replace(cfg.parallel, dp=2, mp=2))
    preds_b, _ = batched_pose_inference(cfg_2d, model, variables["params"],
                                        variables["batch_stats"],
                                        [record(3, 1), record(5, 2)], 0)
    for a, b in zip(preds_a, preds_b):
        np.testing.assert_allclose(a["pred_RTs"], b["pred_RTs"], atol=1e-5)
        np.testing.assert_allclose(a["pred_scales"], b["pred_scales"], atol=1e-6)


def test_cross_mesh_shape_resume(rng, tmp_path):
    """Pod-resize resume: a checkpoint saved from a dp=8-sharded run restores
    onto dp=4 and dp=1 meshes and continues with identical numerics.

    This exercises the ``shard_state(mesh, jax.device_get(state))`` host
    round-trip in engine/train.py — checkpoints are topology-free host trees,
    so any mesh shape can adopt them."""
    from hspose_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint
    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model
    from hspose_tpu.parallel.mesh import shard_state
    from test_checkpoint import _fake_batch

    cfg = default_config()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_points=128))
    model = build_model(cfg)
    tx, state0, train_step = build_train_step(cfg, model, jax.random.key(0))
    host_state0 = jax.device_get(state0)

    batch_np = _fake_batch(rng, 8, 128)
    key1, key2 = jax.random.key(5), jax.random.key(7)

    # --- uninterrupted dp=8 run: step 1, checkpoint, step 2 ------------------
    mesh8 = make_mesh(ParallelConfig(dp=8))
    state = shard_state(mesh8, host_state0)
    state, _ = train_step(state, shard_batch(mesh8, batch_np), key1)
    ckpt_path = save_checkpoint(str(tmp_path / "resize"), jax.device_get(state),
                                epoch=0, seed=0)
    state_ref, metrics_ref = train_step(state, shard_batch(mesh8, batch_np), key2)
    loss_ref = float(metrics_ref["total_loss"])
    params_ref = jax.tree_util.tree_leaves(jax.device_get(state_ref.params))

    for dp in (4, 1):
        mesh = make_mesh(ParallelConfig(dp=dp), jax.devices()[:dp])
        # restore into a fresh host-side template, then commit to the new mesh
        template = jax.device_get(build_train_step(cfg, model, jax.random.key(0))[1])
        restored, epoch, seed = restore_checkpoint(ckpt_path, template)
        assert (epoch, seed) == (0, 0)
        restored = shard_state(mesh, jax.device_get(restored))
        state_r, metrics_r = train_step(restored, shard_batch(mesh, batch_np),
                                        key2)
        np.testing.assert_allclose(float(metrics_r["total_loss"]), loss_ref,
                                   rtol=1e-5, err_msg=f"dp={dp}")
        for a, b in zip(params_ref,
                        jax.tree_util.tree_leaves(jax.device_get(state_r.params))):
            np.testing.assert_allclose(a, b, atol=1e-5)

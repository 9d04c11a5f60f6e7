import dataclasses

import jax
import numpy as np
import pytest

from hspose_tpu.config import default_config
from hspose_tpu.engine.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from hspose_tpu.engine.train_step import build_train_step
from hspose_tpu.models.hspose import build_model


@pytest.fixture(scope="module")
def small_cfg():
    cfg = default_config()
    return cfg.replace(data=dataclasses.replace(cfg.data, num_points=128))


@pytest.fixture(scope="module")
def state_and_step(small_cfg):
    model = build_model(small_cfg)
    tx, state, train_step = build_train_step(small_cfg, model, jax.random.key(0))
    # the jitted step donates its input state; keep a host-side master copy and
    # hand each test a fresh device instance
    host_state = jax.device_get(state)
    return model, tx, host_state, train_step


def _fresh(host_state):
    return jax.tree_util.tree_map(jax.numpy.asarray, host_state)


def _tree_equal(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(leaves_a, leaves_b))


class TestCheckpoint:
    def test_save_restore_roundtrip(self, state_and_step, tmp_path):
        _, tx, host_state, _ = state_and_step
        state = _fresh(host_state)
        path = save_checkpoint(str(tmp_path / "ckpt"), jax.device_get(state),
                               epoch=3, seed=42)
        restored, epoch, seed = restore_checkpoint(path, state)
        assert epoch == 3 and seed == 42
        assert _tree_equal(state.params, restored.params)
        assert _tree_equal(state.opt_state, restored.opt_state)
        assert int(restored.step) == int(state.step)

    def test_latest_checkpoint(self, state_and_step, tmp_path):
        _, _, host_state, _ = state_and_step
        state = _fresh(host_state)
        root = str(tmp_path / "many")
        save_checkpoint(root, jax.device_get(state), epoch=1, seed=0)
        save_checkpoint(root, jax.device_get(state), epoch=11, seed=0)
        assert latest_checkpoint(root).endswith("model_011")
        assert latest_checkpoint(str(tmp_path / "nothing")) is None


def _fake_batch(rng, bs, n):
    A = rng.normal(size=(bs, 3, 3))
    Q, _ = np.linalg.qr(A)
    Q *= np.sign(np.linalg.det(Q))[:, None, None]
    return {
        "pcl_in": rng.normal(scale=0.2, size=(bs, n, 3)).astype(np.float32),
        "cat_id": (np.arange(bs) % 6).astype(np.float32),
        "rotation": Q.astype(np.float32),
        "translation": rng.normal(scale=0.1, size=(bs, 3)).astype(np.float32),
        "fsnet_scale": rng.normal(scale=0.01, size=(bs, 3)).astype(np.float32),
        "mean_shape": (np.abs(rng.normal(size=(bs, 3))) * 0.1 + 0.1).astype(np.float32),
        "sym_info": np.tile(np.array([[0, 1, 0, 0]], np.float32), (bs, 1)),
        "aug_bb": rng.uniform(0.8, 1.2, (bs, 3)).astype(np.float32),
        "aug_rt_t": rng.normal(scale=0.01, size=(bs, 3)).astype(np.float32),
        "aug_rt_R": np.tile(np.eye(3, dtype=np.float32), (bs, 1, 1)),
        "model_point": rng.normal(scale=0.1, size=(bs, 256, 3)).astype(np.float32),
        "nocs_scale": (np.abs(rng.normal(size=(bs,))) + 0.5).astype(np.float32),
    }


class TestTrainStep:
    def test_two_steps_reduce_or_change_loss(self, state_and_step, small_cfg, rng):
        _, _, host_state, train_step = state_and_step
        batch = {k: jax.numpy.asarray(v) for k, v in
                 _fake_batch(rng, 4, small_cfg.data.num_points).items()}
        key = jax.random.key(5)
        state1, m1 = train_step(_fresh(host_state), batch, key)
        assert np.isfinite(float(m1["total_loss"]))
        assert int(state1.step) == 1
        params1 = jax.device_get(state1.params)  # snapshot before donation
        state2, m2 = train_step(state1, batch, key)
        assert np.isfinite(float(m2["total_loss"]))
        # params actually moved
        diff = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).sum()),
            params1, jax.device_get(state2.params))
        assert sum(jax.tree_util.tree_leaves(diff)) > 0

    def test_metrics_keys(self, state_and_step, small_cfg, rng):
        _, _, host_state, train_step = state_and_step
        batch = {k: jax.numpy.asarray(v) for k, v in
                 _fake_batch(rng, 4, small_cfg.data.num_points).items()}
        _, metrics = train_step(_fresh(host_state), batch, jax.random.key(0))
        assert "total_loss" in metrics and "skipped_nan" in metrics
        assert any(k.startswith("fsnet_loss/") for k in metrics)
        assert any(k.startswith("recon_loss/") for k in metrics)

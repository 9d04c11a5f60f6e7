import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hspose_tpu.config import default_config


def test_gradient_accumulation_steps_every_k(rng):
    """accumulate=2 must update params only every second micro-batch
    (reference engine/train.py:105-113)."""
    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model
    from test_checkpoint import _fake_batch

    cfg = default_config()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_points=128),
                      train=dataclasses.replace(cfg.train, accumulate=2))
    model = build_model(cfg)
    _, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    host = jax.device_get(state)
    state = jax.tree_util.tree_map(jnp.asarray, host)
    batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng, 4, 128).items()}

    p0 = jax.device_get(state.params)
    state, _ = train_step(state, batch, jax.random.key(1))
    p1 = jax.device_get(state.params)
    # first micro-batch: no parameter change yet
    d01 = sum(float(np.abs(a - b).sum()) for a, b in
              zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)))
    assert d01 == 0.0
    state, _ = train_step(state, batch, jax.random.key(1))
    p2 = jax.device_get(state.params)
    d12 = sum(float(np.abs(a - b).sum()) for a, b in
              zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)))
    assert d12 > 0.0


def test_recon_metric_aggregation():
    from hspose_tpu.evaluation.metrics import aggregate_recon_metrics
    from hspose_tpu.geometry.symmetry import SYNSET_NAMES

    results = [
        {"pred_class_ids": np.array([1, 1, 3]),
         "chamfer_dis_cass": np.array([0.1, 0.3, 0.5]),
         "emd_dis_cass": np.array([0.2, 0.4, 0.6])},
        {"pred_class_ids": np.array([])},
    ]
    out = aggregate_recon_metrics(results, SYNSET_NAMES)
    np.testing.assert_allclose(out["cmf"]["bottle"], 0.2)
    np.testing.assert_allclose(out["cmf"]["camera"], 0.5)
    np.testing.assert_allclose(out["cmf"]["mean"], 0.35)
    np.testing.assert_allclose(out["emd"]["bottle"], 0.3)


def test_fs_net_recon_branch(rng):
    from hspose_tpu.losses import fs_net_loss

    cfg = default_config().loss
    pred = {"Rot1": jnp.zeros((2, 3)), "Rot2": jnp.zeros((2, 3)),
            "Rot1_f": jnp.zeros(2), "Rot2_f": jnp.zeros(2),
            "Tran": jnp.zeros((2, 3)), "Size": jnp.zeros((2, 3)),
            "Recon": jnp.ones((2, 16, 3))}
    gt = dict(pred)
    gt["Recon"] = jnp.zeros((2, 16, 3))
    out = fs_net_loss(cfg, ["Recon"], pred, gt, jnp.zeros((2, 4)))
    np.testing.assert_allclose(float(out["Recon"]), cfg.recon_w * 1.0)


def test_init_distributed_single_host():
    from hspose_tpu.parallel.mesh import init_distributed

    assert init_distributed() == 1

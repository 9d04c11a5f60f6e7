"""Fault tolerance: the NaN guard must skip the update, not poison the params
(reference engine/train.py:99-103)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hspose_tpu.config import default_config
from test_checkpoint import _fake_batch


def test_nan_batch_skips_update(rng):
    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model

    cfg = default_config()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_points=128))
    model = build_model(cfg)
    _, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    host = jax.device_get(state)
    state = jax.tree_util.tree_map(jnp.asarray, host)

    batch = _fake_batch(rng, 4, 128)
    batch["pcl_in"][0, 0, 0] = np.nan  # poisoned sample
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    state2, metrics = train_step(state, jbatch, jax.random.key(1))
    assert not np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["skipped_nan"]) == 1.0
    # params untouched, step still advances (reference continues the loop)
    p_old = jax.tree_util.tree_leaves(host.params)
    p_new = jax.tree_util.tree_leaves(jax.device_get(state2.params))
    assert all(np.array_equal(a, b) for a, b in zip(p_old, p_new))
    assert int(state2.step) == 1

    # a healthy batch afterwards trains normally
    good = {k: jnp.asarray(v) for k, v in _fake_batch(rng, 4, 128).items()}
    state3, m3 = train_step(state2, good, jax.random.key(2))
    assert np.isfinite(float(m3["total_loss"]))
    assert float(m3["skipped_nan"]) == 0.0


def test_debug_nan_sanitizer_mode(rng):
    """Sanitizer (train.debug_nan): finite-per-family metrics + jax_debug_nans
    raising at the faulting op — the analog of the reference's always-on
    torch.autograd.set_detect_anomaly(True) (engine/train.py:22)."""
    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model

    cfg = default_config()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_points=128),
                      train=dataclasses.replace(cfg.train, debug_nan=True))
    model = build_model(cfg)

    # engine/train.py enables the flag BEFORE the step compiles — a flip after
    # the first dispatch is ignored by the jit fast path, so the test mirrors the
    # real call order
    jax.config.update("jax_debug_nans", True)
    try:
        _, state, train_step = build_train_step(cfg, model, jax.random.key(0))
        state = jax.tree_util.tree_map(jnp.asarray, jax.device_get(state))

        # clean batch: no raise, all families report finite
        good = {k: jnp.asarray(v) for k, v in _fake_batch(rng, 4, 128).items()}
        state2, metrics = train_step(state, good, jax.random.key(1))
        fams = [k for k in metrics if k.startswith("finite/")]
        assert sorted(fams) == ["finite/fsnet_loss", "finite/geo_loss",
                                "finite/prop_loss", "finite/recon_loss"]
        assert all(float(metrics[k]) == 1.0 for k in fams)

        # poisoned batch: the loop-level check raises naming the faulting
        # families (jax_debug_nans alone only inspects slow-path dispatches, so
        # a NaN under the cached executable would sail through it)
        from hspose_tpu.engine.train_step import check_finite_metrics

        bad = _fake_batch(rng, 4, 128)
        bad["pcl_in"][0, 0, 0] = np.nan
        jbad = {k: jnp.asarray(v) for k, v in bad.items()}
        raised = False
        try:
            _, m = train_step(state2, jbad, jax.random.key(2))
            check_finite_metrics(jax.device_get(m))
        except FloatingPointError as e:
            raised = True
            assert "fsnet_loss" in str(e)
        assert raised, "sanitizer should raise on the poisoned batch"
    finally:
        jax.config.update("jax_debug_nans", False)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hspose_tpu.config import default_config
from hspose_tpu.models import build_model
from hspose_tpu.models.hspose import eval_forward, train_forward, total_loss


N_PTS = 128  # small cloud for test speed; pooled sizes 32 / 8


@pytest.fixture(scope="module")
def cfg():
    return default_config()


@pytest.fixture(scope="module")
def model_and_vars(cfg):
    model = build_model(cfg)
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(2, N_PTS, 3)), jnp.float32)
    obj_id = jnp.array([0, 5], jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "pool": jax.random.key(1),
         "dropout": jax.random.key(2)},
        pts, obj_id, True)
    return model, variables


def _fake_batch(rng, bs=2, n=N_PTS):
    A = rng.normal(size=(bs, 3, 3))
    Q, _ = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    aug_R = np.tile(np.eye(3, dtype=np.float32), (bs, 1, 1))
    return {
        "pcl_in": rng.normal(scale=0.1, size=(bs, n, 3)).astype(np.float32),
        "cat_id": np.array([1, 5], np.float32)[:bs],
        "rotation": Q.astype(np.float32),
        "translation": rng.normal(scale=0.1, size=(bs, 3)).astype(np.float32),
        "fsnet_scale": rng.normal(scale=0.01, size=(bs, 3)).astype(np.float32),
        "mean_shape": np.abs(rng.normal(scale=0.1, size=(bs, 3))).astype(np.float32) + 0.1,
        "sym_info": np.array([[1, 1, 0, 1], [0, 1, 0, 0]], np.float32)[:bs],
        "aug_bb": rng.uniform(0.8, 1.2, size=(bs, 3)).astype(np.float32),
        "aug_rt_t": rng.normal(scale=0.01, size=(bs, 3)).astype(np.float32),
        "aug_rt_R": aug_R,
        "model_point": rng.normal(scale=0.1, size=(bs, 1024, 3)).astype(np.float32),
        "nocs_scale": np.abs(rng.normal(size=(bs,))).astype(np.float32) + 0.5,
    }


class TestPoseNetShapes:
    def test_train_output_shapes(self, model_and_vars):
        model, variables = model_and_vars
        pts = jnp.asarray(np.random.default_rng(2).normal(size=(2, N_PTS, 3)),
                          jnp.float32)
        obj_id = jnp.array([0, 5], jnp.int32)
        out, _ = model.apply(variables, pts, obj_id, True,
                             rngs={"pool": jax.random.key(3), "dropout": jax.random.key(4)},
                             mutable=["batch_stats"])
        assert out.recon.shape == (2, N_PTS, 3)
        assert out.face_normal.shape == (2, N_PTS, 6, 3)
        assert out.face_dis.shape == (2, N_PTS, 6)
        assert out.face_f.shape == (2, N_PTS, 6)
        assert out.p_green_R.shape == (2, 3)
        assert out.pred_T.shape == (2, 3)
        assert out.pred_s.shape == (2, 3)
        # axis vectors are unit, confidences in (0, 1)
        np.testing.assert_allclose(np.linalg.norm(out.p_green_R, axis=-1), 1.0, atol=1e-4)
        assert np.all(np.asarray(out.face_f) >= 0) and np.all(np.asarray(out.face_f) <= 1)
        norms = np.linalg.norm(np.asarray(out.face_normal), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_eval_mode_skips_heads(self, model_and_vars, cfg):
        model, variables = model_and_vars
        pts = jnp.asarray(np.random.default_rng(3).normal(size=(2, N_PTS, 3)),
                          jnp.float32)
        out = eval_forward(model, variables["params"], variables["batch_stats"],
                           jax.random.key(5), pts, jnp.array([0, 3]))
        assert out.recon is None and out.face_normal is None
        assert out.p_green_R.shape == (2, 3)

    def test_feature_dim_is_1286(self, model_and_vars, cfg):
        # rotation head input channels must match the reference's feat_c_R
        model, variables = model_and_vars
        kernel = variables["params"]["rot_green"]["vec"]["conv1"]["kernel"]
        assert kernel.shape[0] == cfg.model.feat_c_rot == 1286
        ts_kernel = variables["params"]["ts"]["vec"]["conv1"]["kernel"]
        assert ts_kernel.shape[0] == cfg.model.feat_c_ts == 1289


class TestTrainForward:
    def test_losses_finite_and_grads_flow(self, model_and_vars, cfg, rng):
        model, variables = model_and_vars
        batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng).items()}
        rngs = {"augment": jax.random.key(10), "pool": jax.random.key(11),
                "dropout": jax.random.key(12)}

        def loss_fn(params):
            total, (dicts, _) = train_forward(cfg, model, params,
                                              variables["batch_stats"], rngs, batch)
            return total, dicts

        (total, dicts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        assert np.isfinite(float(total))
        # all four families present with the PoseNet_only names
        assert set(dicts.keys()) == {"fsnet_loss", "recon_loss", "geo_loss", "prop_loss"}
        assert set(dicts["fsnet_loss"]) == {"Rot1", "Rot1_cos", "Rot2", "Rot2_cos",
                                            "Rot_r_a", "Tran", "Size", "R_con"}
        assert set(dicts["recon_loss"]) == {"recon_per_p", "recon_p_f",
                                            "recon_point_vote", "recon_point_r",
                                            "recon_point_t", "recon_point_s",
                                            "recon_point_self"}
        assert set(dicts["geo_loss"]) == {"geo_point"}
        assert set(dicts["prop_loss"]) == {"Prop_pm", "Prop_sym_recon", "Prop_sym_rt"}
        # gradients reach the backbone and every head
        gnorm = jax.tree_util.tree_map(lambda g: float(jnp.sum(jnp.abs(g))), grads)
        flat = jax.tree_util.tree_leaves(gnorm)
        assert all(np.isfinite(v) for v in flat)
        for top in ["face_recon", "rot_green", "rot_red", "ts"]:
            sub = jax.tree_util.tree_leaves(gnorm[top] if isinstance(gnorm, dict)
                                            else gnorm)
            assert any(v > 0 for v in sub), f"no gradient reached {top}"

    def test_total_loss_sums_all_terms(self):
        dicts = {"a": {"x": jnp.array(1.0), "y": jnp.array(2.0)},
                 "b": {"z": jnp.array(3.0)}}
        assert float(total_loss(dicts)) == 6.0


class TestBatchNorm:
    def test_batch_stats_update_in_train(self, model_and_vars):
        model, variables = model_and_vars
        pts = jnp.asarray(np.random.default_rng(5).normal(size=(2, N_PTS, 3)) * 5,
                          jnp.float32)
        _, mutated = model.apply(variables, pts, jnp.array([0, 1]), True,
                                 rngs={"pool": jax.random.key(6),
                                       "dropout": jax.random.key(7)},
                                 mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


@pytest.mark.slow
def test_bf16_mixed_precision_train_step(rng):
    """model.compute_dtype=bfloat16 trains end-to-end (bf16 backbone/heads,
    f32 params/losses/optimizer): finite losses across steps and params move."""
    import dataclasses

    from hspose_tpu.config import default_config
    from hspose_tpu.engine.train_step import build_train_step
    from test_checkpoint import _fake_batch

    cfg = default_config()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, num_points=128),
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    model = build_model(cfg)
    tx, state, step = build_train_step(cfg, model, jax.random.key(0))
    p0 = jax.device_get(state.params)
    batch = {k: jnp.asarray(v)
             for k, v in _fake_batch(rng, 4, 128).items()}
    for i in range(2):
        state, m = step(state, batch, jax.random.key(i))
        assert np.isfinite(float(m["total_loss"])), i
    # params stay f32 and actually move
    leaves0 = jax.tree_util.tree_leaves(p0)
    leaves1 = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert all(l.dtype == np.float32 for l in leaves1)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


class TestServeRelaxKnobs:
    """Relaxed-KNN serving knobs (config.py serve_k / serve_rf_reuse): eval-only
    semantic relaxations — same parameter tree, finite outputs, and training
    semantics untouched (the knobs are read only when train=False)."""

    def test_relaxed_eval_runs_on_shared_params(self, model_and_vars, cfg):
        import dataclasses

        model, variables = model_and_vars
        pts = jnp.asarray(np.random.default_rng(5).normal(size=(2, N_PTS, 3)),
                          jnp.float32)
        obj_id = jnp.array([1, 3], jnp.int32)
        base = eval_forward(model, variables["params"], variables["batch_stats"],
                            jax.random.key(2), pts, obj_id)
        for knobs in ({"serve_rf_reuse": True}, {"serve_k": 12},
                      {"serve_k": 12, "serve_rf_reuse": True}):
            m2 = build_model(cfg.replace(model=dataclasses.replace(
                cfg.model, **knobs)))
            out = eval_forward(m2, variables["params"], variables["batch_stats"],
                               jax.random.key(2), pts, obj_id)
            for name in ("p_green_R", "pred_T", "pred_s"):
                v = np.asarray(getattr(out, name))
                assert np.all(np.isfinite(v)), (knobs, name)
            # the relaxation must actually change the graph's neighbourhoods
            assert not np.allclose(np.asarray(out.p_green_R),
                                   np.asarray(base.p_green_R), atol=1e-7), knobs

    def test_train_forward_ignores_knobs(self, cfg, rng):
        """train_forward with relaxation knobs set must equal the base train
        forward bit-for-bit (reference training semantics preserved)."""
        import dataclasses

        model = build_model(cfg)
        cfg2 = cfg.replace(model=dataclasses.replace(
            cfg.model, serve_k=12, serve_rf_reuse=True))
        model2 = build_model(cfg2)
        pts = jnp.asarray(np.random.default_rng(3).normal(size=(2, N_PTS, 3)),
                          jnp.float32)
        obj_id = jnp.array([0, 4], jnp.int32)
        variables = model.init(
            {"params": jax.random.key(0), "pool": jax.random.key(1),
             "dropout": jax.random.key(2)}, pts, obj_id, True)
        rngs = {"pool": jax.random.key(7), "dropout": jax.random.key(8),
                "aug": jax.random.key(9)}
        out1, _ = model.apply(variables, pts, obj_id, True, rngs=rngs,
                              mutable=["batch_stats"])
        out2, _ = model2.apply(variables, pts, obj_id, True, rngs=rngs,
                               mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(out1[2][:, :, :16]),
                                      np.asarray(out2[2][:, :, :16]))

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hspose_tpu.config import OptimConfig
from hspose_tpu.engine.optimizer import (
    build_optimizer,
    gradient_centralization,
    lookahead,
    radam_rectified,
)
from hspose_tpu.engine.schedule import build_schedule, flat_and_anneal_factor


class TestSchedule:
    def test_warmup_flat_anneal_shape(self):
        total = 10000
        f0 = float(flat_and_anneal_factor(0, total))
        f_mid_warm = float(flat_and_anneal_factor(500, total))
        f_flat = float(flat_and_anneal_factor(5000, total))
        f_end = float(flat_and_anneal_factor(total, total))
        assert abs(f0 - 1e-3) < 1e-6
        assert 0.4 < f_mid_warm < 0.6
        assert abs(f_flat - 1.0) < 1e-6
        assert f_end < 1e-6

    def test_anneal_starts_at_72_percent(self):
        total = 10000
        assert abs(float(flat_and_anneal_factor(7199, total)) - 1.0) < 1e-6
        assert float(flat_and_anneal_factor(7300, total)) < 1.0

    def test_cosine_midpoint(self):
        total = 10000
        # halfway through the anneal the factor is 0.5
        mid = 0.72 * total + 0.5 * (total - 0.72 * total)
        np.testing.assert_allclose(float(flat_and_anneal_factor(mid, total)), 0.5,
                                   atol=1e-6)

    def test_build_schedule_scales_base_lr(self):
        cfg = OptimConfig(lr=1e-4)
        sched = build_schedule(cfg, 10000)
        np.testing.assert_allclose(float(sched(5000)), 1e-4, rtol=1e-6)


class TestGradientCentralization:
    def test_kernel_centralized_over_input_axes(self):
        gc = gradient_centralization()
        params = {"dense": {"kernel": jnp.zeros((4, 3)), "bias": jnp.zeros(3)}}
        grads = {"dense": {"kernel": jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
                           "bias": jnp.arange(3, dtype=jnp.float32)}}
        out, _ = gc.update(grads, gc.init(params))
        # per-output-column mean removed (flax kernel is (in, out))
        np.testing.assert_allclose(np.asarray(out["dense"]["kernel"]).mean(axis=0),
                                   0.0, atol=1e-6)
        # bias untouched (1D)
        np.testing.assert_allclose(np.asarray(out["dense"]["bias"]),
                                   np.arange(3), atol=0)

    def test_torch_layout_params_centralized_over_trailing_axes(self):
        gc = gradient_centralization()
        params = {"hs": {"directions": jnp.zeros((3, 14))}}
        grads = {"hs": {"directions": jnp.arange(42, dtype=jnp.float32).reshape(3, 14)}}
        out, _ = gc.update(grads, gc.init(params))
        np.testing.assert_allclose(np.asarray(out["hs"]["directions"]).mean(axis=1),
                                   0.0, atol=1e-5)


class TestRAdam:
    def test_matches_reference_trace(self):
        """Replicate ranger2020's update math step by step on a scalar parameter."""
        b1, b2, eps, thr = 0.95, 0.999, 1e-5, 5
        opt = radam_rectified(b1, b2, eps, thr)
        p = {"w": jnp.array([2.0])}
        state = opt.init(p)

        rng = np.random.default_rng(0)
        m = np.zeros(1)
        v = np.zeros(1)
        for t in range(1, 12):
            g = rng.normal(size=1).astype(np.float32)
            upd, state = opt.update({"w": jnp.array(g)}, state, p)
            # manual reference math
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            beta2_t = b2 ** t
            n_max = 2 / (1 - b2) - 1
            n_sma = n_max - 2 * t * beta2_t / (1 - beta2_t)
            if n_sma > thr:
                step_size = np.sqrt((1 - beta2_t) * (n_sma - 4) / (n_max - 4)
                                    * (n_sma - 2) / n_sma * n_max / (n_max - 2)) / (1 - b1 ** t)
                expect = step_size * m / (np.sqrt(v) + eps)
            else:
                step_size = 1.0 / (1 - b1 ** t)
                expect = step_size * m
            # f32 vs f64 rounding is amplified near the rectification knee (t≈6);
            # branch decisions are verified exact, magnitudes to 1%
            np.testing.assert_allclose(np.asarray(upd["w"]), expect, rtol=1e-2)


class TestLookahead:
    def test_sync_every_k(self):
        k, alpha = 3, 0.5
        la = lookahead(k, alpha)
        p = {"w": jnp.array([0.0])}
        state = la.init(p)
        fast = 0.0
        for step in range(1, 8):
            u = {"w": jnp.array([1.0])}  # inner update +1 each step
            out, state = la.update(u, state, {"w": jnp.array([fast])})
            fast = fast + float(out["w"][0])
        # final value: after 7 steps with sync at 3 and 6:
        # steps1-2: fast=2; step3: fast_would=3, slow=1.5, fast=1.5
        # steps4-5: fast=3.5; step6: fast_would=4.5, slow=1.5+0.5*3=3.0, fast=3.0
        # step7: fast=4.0
        np.testing.assert_allclose(fast, 4.0, atol=1e-6)


class TestFullChain:
    def test_descends_quadratic(self):
        # NB: RAdam's variance rectification keeps early steps deliberately small
        # (×~0.01 at t≈10 with β₂=0.999, ramping slowly — verified against the
        # reference trace in TestRAdam), so convergence needs many steps.
        cfg = OptimConfig(lr=0.1, warmup_iters=0)
        tx = build_optimizer(cfg, total_iters=100000)
        params = {"w": jnp.array([5.0, -3.0])}
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            g = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
            upd, state = tx.update(g, state, params)
            return optax.apply_updates(params, upd), state

        for _ in range(1500):
            params, state = step(params, state)
        assert float(jnp.sum(params["w"] ** 2)) < 0.05

    def test_clip_is_applied(self):
        cfg = OptimConfig(lr=1.0, warmup_iters=0, clip_grad_norm=5.0)
        tx = build_optimizer(cfg, 100)
        params = {"w": jnp.array([0.0])}
        state = tx.init(params)
        g = {"w": jnp.array([1e6])}
        upd, _ = tx.update(g, state, params)
        # clipped to norm 5 then radam-normalized: finite, bounded
        assert np.isfinite(float(upd["w"][0]))


class TestSchedulerVariants:
    """WarmupMultiStepLR / WarmupCosineLR curves (reference
    tools/solver_utils.py:62-78, detectron2 semantics)."""

    def test_multistep_curve(self):
        from hspose_tpu.engine.schedule import warmup_multistep_factor

        total, wi, wf, gamma = 9000, 900, 1e-3, 0.1
        rel = (2 / 3, 8 / 9)
        # warmup start: factor ~= warmup_factor
        assert abs(float(warmup_multistep_factor(0, total, rel, gamma, wi, wf)) - wf) < 1e-6
        # mid warmup: linear blend
        alpha = 450 / wi
        want = wf * (1 - alpha) + alpha
        np.testing.assert_allclose(
            float(warmup_multistep_factor(450, total, rel, gamma, wi, wf)), want,
            rtol=1e-6)
        # flat at 1.0 after warmup, before first milestone (6000)
        assert float(warmup_multistep_factor(5999, total, rel, gamma, wi, wf)) == 1.0
        # gamma after first milestone, gamma^2 after second (8000)
        np.testing.assert_allclose(
            float(warmup_multistep_factor(6000, total, rel, gamma, wi, wf)), gamma,
            rtol=1e-6)
        np.testing.assert_allclose(
            float(warmup_multistep_factor(8500, total, rel, gamma, wi, wf)),
            gamma ** 2, rtol=1e-6)

    def test_cosine_curve(self):
        from hspose_tpu.engine.schedule import warmup_cosine_factor

        total, wi, wf = 10000, 1000, 1e-3
        # after warmup: 0.5*(1+cos(pi * t/T))
        for step in (2000, 5000, 9000):
            want = 0.5 * (1 + np.cos(np.pi * step / total))
            np.testing.assert_allclose(
                float(warmup_cosine_factor(step, total, wi, wf)), want, rtol=1e-5)
        # warmup region is additionally scaled by the linear blend
        alpha = 500 / wi
        blend = wf * (1 - alpha) + alpha
        want = blend * 0.5 * (1 + np.cos(np.pi * 500 / total))
        np.testing.assert_allclose(
            float(warmup_cosine_factor(500, total, wi, wf)), want, rtol=1e-5)

    def test_constant_warmup(self):
        from hspose_tpu.engine.schedule import warmup_cosine_factor

        total, wi, wf = 10000, 1000, 0.5
        got = float(warmup_cosine_factor(100, total, wi, wf, "constant"))
        want = wf * 0.5 * (1 + np.cos(np.pi * 100 / total))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_build_schedule_dispatch(self):
        import dataclasses

        from hspose_tpu.config import default_config
        from hspose_tpu.engine.schedule import build_schedule

        cfg = default_config().optim
        for name in ("WarmupMultiStepLR", "WarmupCosineLR", "flat_and_anneal"):
            sched = build_schedule(dataclasses.replace(cfg, lr_scheduler_name=name),
                                   10000)
            assert np.isfinite(float(sched(5000)))
        try:
            build_schedule(dataclasses.replace(cfg, lr_scheduler_name="bogus"),
                           10000)(0)
            assert False, "should have raised"
        except ValueError:
            pass

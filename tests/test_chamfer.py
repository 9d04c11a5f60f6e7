import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hspose_tpu.ops.chamfer import (
    chamfer_distance,
    chamfer_distance_kernel,
    chamfer_distance_pallas,
    chamfer_loss,
)
from hspose_tpu.ops.emd import emd_distance


def _brute_chamfer(a, b):
    d = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    return d.min(-1), d.min(-2)


class TestChamferXLA:
    def test_matches_bruteforce(self, rng):
        a = rng.normal(size=(2, 64, 3)).astype(np.float32)
        b = rng.normal(size=(2, 48, 3)).astype(np.float32)
        da, db = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
        ea, eb = _brute_chamfer(a.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(np.asarray(da), ea, atol=1e-4)
        np.testing.assert_allclose(np.asarray(db), eb, atol=1e-4)

    def test_zero_for_identical_clouds(self, rng):
        a = rng.normal(size=(1, 32, 3)).astype(np.float32)
        da, db = chamfer_distance(jnp.asarray(a), jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(da), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(db), 0.0, atol=1e-5)

    def test_gradient_matches_finite_difference(self, rng):
        a = rng.normal(size=(1, 12, 3)).astype(np.float64).astype(np.float32)
        b = rng.normal(size=(1, 10, 3)).astype(np.float32)

        def f(a_):
            return chamfer_loss(a_, jnp.asarray(b))

        g = jax.grad(f)(jnp.asarray(a))
        eps = 1e-3
        for idx in [(0, 0, 0), (0, 5, 1), (0, 11, 2)]:
            ap = a.copy(); ap[idx] += eps
            am = a.copy(); am[idx] -= eps
            fd = (float(f(jnp.asarray(ap))) - float(f(jnp.asarray(am)))) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), fd, rtol=2e-2, atol=1e-4)

    def test_gradient_through_b(self, rng):
        a = rng.normal(size=(1, 12, 3)).astype(np.float32)
        b = rng.normal(size=(1, 10, 3)).astype(np.float32)

        def f(b_):
            return chamfer_loss(jnp.asarray(a), b_)

        g = jax.grad(f)(jnp.asarray(b))
        eps = 1e-3
        for idx in [(0, 0, 0), (0, 9, 2)]:
            bp = b.copy(); bp[idx] += eps
            bm = b.copy(); bm[idx] -= eps
            fd = (float(f(jnp.asarray(bp))) - float(f(jnp.asarray(bm)))) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), fd, rtol=2e-2, atol=1e-4)


class TestChamferPallas:
    def test_interpret_matches_xla(self, rng):
        a = rng.normal(size=(2, 128, 3)).astype(np.float32)
        b = rng.normal(size=(2, 64, 3)).astype(np.float32)
        da, db = chamfer_distance_pallas(jnp.asarray(a), jnp.asarray(b),
                                         interpret=True)
        ea, eb = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(da), np.asarray(ea), atol=1e-4)
        np.testing.assert_allclose(np.asarray(db), np.asarray(eb), atol=1e-4)


class TestChamferKernelVJP:
    """The fully-Pallas op (forward with argmin + fused backward kernel),
    the kernel-for-kernel match of chamfer_distance.cu:6-187."""

    def test_forward_matches_xla(self, rng):
        a = rng.normal(size=(2, 128, 3)).astype(np.float32)
        b = rng.normal(size=(2, 64, 3)).astype(np.float32)
        da, db = chamfer_distance_kernel(jnp.asarray(a), jnp.asarray(b), True)
        ea, eb = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(da), np.asarray(ea), atol=1e-4)
        np.testing.assert_allclose(np.asarray(db), np.asarray(eb), atol=1e-4)

    def test_backward_kernel_matches_xla_vjp(self, rng):
        a = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
        gda = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
        gdb = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))

        _, vjp_k = jax.vjp(lambda x, y: chamfer_distance_kernel(x, y, True), a, b)
        _, vjp_x = jax.vjp(chamfer_distance, a, b)
        ga_k, gb_k = vjp_k((gda, gdb))
        ga_x, gb_x = vjp_x((gda, gdb))
        np.testing.assert_allclose(np.asarray(ga_k), np.asarray(ga_x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb_k), np.asarray(gb_x), atol=1e-4)

    def test_loss_grad_finite_difference(self, rng):
        a = rng.normal(size=(1, 16, 3)).astype(np.float32)
        b = rng.normal(size=(1, 8, 3)).astype(np.float32)

        def f(a_):
            da, db = chamfer_distance_kernel(a_, jnp.asarray(b), True)
            return jnp.mean(da) + jnp.mean(db)

        g = jax.grad(f)(jnp.asarray(a))
        eps = 1e-3
        for idx in [(0, 0, 0), (0, 7, 1), (0, 15, 2)]:
            ap = a.copy(); ap[idx] += eps
            am = a.copy(); am[idx] -= eps
            fd = (float(f(jnp.asarray(ap))) - float(f(jnp.asarray(am)))) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), fd, rtol=2e-2, atol=1e-4)


class TestEMD:
    def test_matches_exact_assignment(self, rng):
        from scipy.optimize import linear_sum_assignment

        a = rng.normal(size=(2, 32, 3)).astype(np.float32)
        b = rng.normal(size=(2, 32, 3)).astype(np.float32)
        approx = np.asarray(emd_distance(jnp.asarray(a), jnp.asarray(b),
                                         epsilon=0.005, iters=500))
        for i in range(2):
            C = np.linalg.norm(a[i][:, None] - b[i][None], axis=-1)
            r, c = linear_sum_assignment(C)
            exact = C[r, c].mean()
            np.testing.assert_allclose(approx[i], exact, rtol=5e-3)

    def test_zero_for_identical_clouds(self, rng):
        a = rng.normal(size=(1, 24, 3)).astype(np.float32)
        d = np.asarray(emd_distance(jnp.asarray(a), jnp.asarray(a),
                                    epsilon=0.005, iters=500))
        np.testing.assert_allclose(d, 0.0, atol=1e-5)

    def test_translation_sensitivity(self, rng):
        # EMD of a cloud vs its translate is exactly the translation norm
        a = rng.normal(size=(1, 32, 3)).astype(np.float32)
        shift = np.array([0.5, 0.0, 0.0], np.float32)
        d = float(emd_distance(jnp.asarray(a), jnp.asarray(a + shift),
                               epsilon=0.005, iters=500)[0])
        np.testing.assert_allclose(d, 0.5, rtol=2e-2)

    def test_production_operating_point_bias(self, rng):
        """Pin the SHIPPED (eval.emd_epsilon, eval.emd_iters) operating point
        at production shapes: N=1028 box-surface clouds in the 'near' regime a
        trained recon head produces (the regime with the largest relative
        entropic bias — scripts/probe_emd_bias.py measured +3.0%±0.3 there,
        vs +30% at the old (0.02, 50) point).  Guards both the defaults and
        the solver against regressions that would silently re-bias the
        emd_dis_cass numbers (ref consumer: eval_utils_v1.py:672-707)."""
        from scipy.optimize import linear_sum_assignment

        from hspose_tpu.config import default_config

        cfg = default_config()
        assert (cfg.eval.emd_epsilon, cfg.eval.emd_iters) == (0.005, 200)

        N = 1028
        face = rng.integers(0, 6, N)
        uv = rng.uniform(-0.5, 0.5, (N, 3))
        pts = uv.copy()
        pts[np.arange(N), face // 2] = np.where(face % 2 == 0, -0.5, 0.5)
        a = (pts * np.array([0.12, 0.2, 0.1])).astype(np.float32)
        b = (a + rng.normal(0, 0.005, a.shape)).astype(np.float32)

        approx = float(emd_distance(jnp.asarray(a[None]), jnp.asarray(b[None]),
                                    epsilon=cfg.eval.emd_epsilon,
                                    iters=cfg.eval.emd_iters)[0])
        C = np.linalg.norm(a[:, None] - b[None], axis=-1)
        r, c = linear_sum_assignment(C)
        exact = C[r, c].mean()
        rel = (approx - exact) / exact
        # entropic EMD upper-bounds the exact value; measured +3.0%±0.3
        assert 0.0 <= rel <= 0.06, f"production EMD bias {rel:+.3%}"

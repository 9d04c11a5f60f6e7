import numpy as np
import jax.numpy as jnp
import pytest

from hspose_tpu.geometry import boxes, planes, rotations, symmetry

import oracles


def random_rotations(rng, n):
    """Uniform-ish random rotation matrices via QR."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    Q *= np.sign(np.diagonal(R, axis1=-2, axis2=-1))[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q.astype(np.float32)


class TestVerticalRotVec:
    def test_matches_scalar_oracle(self, rng):
        n = 16
        y = rng.normal(size=(n, 3)).astype(np.float32)
        z = rng.normal(size=(n, 3)).astype(np.float32)
        y /= np.linalg.norm(y, axis=-1, keepdims=True)
        z /= np.linalg.norm(z, axis=-1, keepdims=True)
        c1 = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
        c2 = rng.uniform(0.1, 1.0, size=n).astype(np.float32)

        ny, nz = rotations.get_vertical_rot_vec(jnp.array(c1), jnp.array(c2),
                                                jnp.array(y), jnp.array(z))
        for i in range(n):
            oy, oz = oracles.vertical_rot_vec_single(c1[i], c2[i], y[i], z[i])
            np.testing.assert_allclose(np.asarray(ny)[i], oy, atol=1e-5)
            np.testing.assert_allclose(np.asarray(nz)[i], oz, atol=1e-5)

    def test_output_is_orthogonal(self, rng):
        y = rng.normal(size=(8, 3)).astype(np.float32)
        z = rng.normal(size=(8, 3)).astype(np.float32)
        y /= np.linalg.norm(y, axis=-1, keepdims=True)
        z /= np.linalg.norm(z, axis=-1, keepdims=True)
        c = jnp.ones(8)
        ny, nz = rotations.get_vertical_rot_vec(c, c, jnp.array(y), jnp.array(z))
        dots = np.sum(np.asarray(ny) * np.asarray(nz), axis=-1)
        np.testing.assert_allclose(dots, 0.0, atol=1e-4)

    def test_high_confidence_vector_moves_less(self, rng):
        y = np.array([[0.0, 1.0, 0.0]], dtype=np.float32)
        z = np.array([[0.5, 0.5, 0.0]], dtype=np.float32)
        z /= np.linalg.norm(z)
        ny, nz = rotations.get_vertical_rot_vec(jnp.array([100.0]), jnp.array([0.01]),
                                                jnp.array(y), jnp.array(z))
        # y confident => y barely moves
        assert float(np.dot(np.asarray(ny)[0], y[0])) > 0.9999


class TestRotMatYFirst:
    def test_matches_oracle_and_is_rotation(self, rng):
        y = rng.normal(size=(12, 3)).astype(np.float32)
        x = rng.normal(size=(12, 3)).astype(np.float32)
        R = np.asarray(rotations.get_rot_mat_y_first(jnp.array(y), jnp.array(x)))
        for i in range(12):
            np.testing.assert_allclose(R[i], oracles.rot_mat_y_first_single(y[i], x[i]), atol=1e-5)
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (12, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_y_column_is_normalized_y(self, rng):
        y = rng.normal(size=(4, 3)).astype(np.float32)
        x = rng.normal(size=(4, 3)).astype(np.float32)
        R = np.asarray(rotations.get_rot_mat_y_first(jnp.array(y), jnp.array(x)))
        yn = y / np.linalg.norm(y, axis=-1, keepdims=True)
        np.testing.assert_allclose(R[:, :, 1], yn, atol=1e-5)


class TestGenerateRT:
    def test_recovers_gt_rotation_with_perfect_axes(self, rng):
        R = random_rotations(rng, 8)
        green = R[:, :, 1]
        red = R[:, :, 0]
        T = rng.normal(size=(8, 3)).astype(np.float32)
        sym = np.zeros((8, 4), dtype=np.int32)
        f = jnp.ones(8)
        RT = np.asarray(rotations.generate_RT(jnp.array(green), jnp.array(red),
                                              f, f, jnp.array(T), jnp.array(sym)))
        np.testing.assert_allclose(RT[:, :3, :3], R, atol=1e-4)
        np.testing.assert_allclose(RT[:, :3, 3], T, atol=1e-6)
        np.testing.assert_allclose(RT[:, 3], np.tile([0, 0, 0, 1], (8, 1)), atol=0)

    def test_symmetric_objects_ignore_red_axis(self, rng):
        R = random_rotations(rng, 4)
        green = R[:, :, 1]
        junk_red = rng.normal(size=(4, 3)).astype(np.float32)
        T = np.zeros((4, 3), dtype=np.float32)
        sym = np.ones((4, 4), dtype=np.int32)
        RT = np.asarray(rotations.generate_RT(jnp.array(green), jnp.array(junk_red),
                                              jnp.ones(4), jnp.ones(4), jnp.array(T),
                                              jnp.array(sym)))
        # y column must equal the (normalized) green vector exactly: red conf zeroed
        np.testing.assert_allclose(RT[:, :3, 1], green, atol=1e-5)


class TestGetGtV:
    def test_columns(self, rng):
        R = random_rotations(rng, 5)
        g, r = rotations.get_gt_v(jnp.array(R))
        np.testing.assert_allclose(np.asarray(g), R[:, :, 1], atol=0)
        np.testing.assert_allclose(np.asarray(r), R[:, :, 0], atol=0)


class TestPlanes:
    def test_matches_scalar_oracle(self, rng):
        pc = rng.normal(size=(2, 3, 50, 3)).astype(np.float32)
        w = rng.uniform(0.1, 1.0, size=(2, 3, 50)).astype(np.float32)
        n, dn, c = planes.fit_plane_weighted(jnp.array(pc), jnp.array(w))
        for i in range(2):
            for j in range(3):
                on, odn, oc = oracles.fit_plane_single(pc[i, j], w[i, j])
                # f32 normal-equation solve vs f64 oracle: tolerance bounded by
                # conditioning, same as the reference's f32 torch.inverse
                np.testing.assert_allclose(np.asarray(n)[i, j], on, atol=2e-3)
                np.testing.assert_allclose(np.asarray(dn)[i, j], odn, atol=2e-3)
                np.testing.assert_allclose(np.asarray(c)[i, j, 0], oc, atol=2e-3)

    def test_recovers_exact_plane(self):
        # points on z = 2x - y + 3, unit weights
        xs, ys = np.meshgrid(np.linspace(-1, 1, 5), np.linspace(-1, 1, 5))
        pc = np.stack([xs.ravel(), ys.ravel(), 2 * xs.ravel() - ys.ravel() + 3], -1)
        n, _, _ = planes.fit_plane_weighted(jnp.array(pc[None], dtype=jnp.float32),
                                            jnp.ones((1, 25)))
        n = np.asarray(n)[0]
        expected = np.array([2.0, -1.0, -1.0])
        expected /= np.linalg.norm(expected)
        assert abs(abs(np.dot(n, expected)) - 1.0) < 1e-4


class TestBoxes:
    def test_pairwise_iou_matches_single_oracle(self, rng):
        P, G = 4, 3
        pred_R = random_rotations(rng, P)
        gt_R = random_rotations(rng, G)
        pred_RT = np.tile(np.eye(4), (P, 1, 1))
        gt_RT = np.tile(np.eye(4), (G, 1, 1))
        pred_RT[:, :3, :3] = pred_R
        gt_RT[:, :3, :3] = gt_R
        pred_RT[:, :3, 3] = rng.normal(scale=0.1, size=(P, 3))
        gt_RT[:, :3, 3] = rng.normal(scale=0.1, size=(G, 3))
        pred_s = rng.uniform(0.5, 1.5, size=(P, 3))
        gt_s = rng.uniform(0.5, 1.5, size=(G, 3))
        sym = rng.random((P, G)) < 0.5

        got = boxes.pairwise_3d_iou(pred_RT, pred_s, gt_RT, gt_s, sym)
        for i in range(P):
            for j in range(G):
                want = oracles.iou_3d_single(pred_RT[i], gt_RT[j], pred_s[i], gt_s[j], sym[i, j])
                np.testing.assert_allclose(got[i, j], want, atol=1e-9)

    def test_identical_boxes_iou_one(self):
        RT = np.eye(4)[None]
        s = np.array([[1.0, 2.0, 3.0]])
        iou = boxes.pairwise_3d_iou(RT, s, RT, s, np.zeros((1, 1), bool))
        np.testing.assert_allclose(iou, 1.0)

    def test_degree_cm_symmetric_vs_full(self, rng):
        R = random_rotations(rng, 1)[0]
        # rotate gt about its own y axis by 90°: y-sym error ~0, full error 90°
        ry = oracles.rodrigues(np.array([0.0, 1.0, 0.0]), np.pi / 2)
        RT1 = np.eye(4); RT1[:3, :3] = R @ ry
        RT2 = np.eye(4); RT2[:3, :3] = R
        err_sym = boxes.pairwise_degree_cm(RT1[None], RT2[None], np.array([True]))
        err_full = boxes.pairwise_degree_cm(RT1[None], RT2[None], np.array([False]))
        assert err_sym[0, 0, 0] < 1e-3
        np.testing.assert_allclose(err_full[0, 0, 0], 90.0, atol=1e-3)

    def test_translation_cm(self):
        RT1 = np.eye(4); RT1[:3, 3] = [0.03, 0.04, 0.0]  # 5 cm apart
        RT2 = np.eye(4)
        err = boxes.pairwise_degree_cm(RT1[None], RT2[None], np.array([False]))
        np.testing.assert_allclose(err[0, 0, 1], 5.0, atol=1e-9)


class TestSymmetryTables:
    def test_mean_shapes(self):
        t = symmetry.mean_shapes_table_m()
        assert t.shape == (6, 3)
        np.testing.assert_allclose(t[0], np.array([87, 220, 89]) / 1000.0, atol=1e-7)

    def test_sym_info_mug_handle(self):
        np.testing.assert_array_equal(symmetry.sym_info("mug", 1), [0, 1, 0, 0])
        np.testing.assert_array_equal(symmetry.sym_info("mug", 0), [1, 0, 0, 0])

    def test_fs_net_scale_zero_residual_for_unit_shape(self):
        model = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], dtype=np.float32)
        # extents * nocs_scale * 1000 == mean shape -> residual 0
        unit = symmetry.mean_shape_mm("can") / 1000.0
        for axis in range(3):
            pass
        model = np.stack([-unit / 2, unit / 2])
        res, mean = symmetry.fs_net_scale("can", model, 1.0)
        np.testing.assert_allclose(res, 0.0, atol=1e-6)
        np.testing.assert_allclose(mean, unit, atol=1e-7)

"""Numeric parity against the reference implementation (optional).

These tests import the reference's torch utilities directly from /root/reference and
compare outputs on shared random inputs.  They are skipped when the reference checkout
is not present, so the suite stays self-contained.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout not available")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import torch  # noqa: E402


@pytest.fixture(scope="module")
def jnp_mods():
    import jax.numpy as jnp
    from hspose_tpu.geometry import planes, rotations
    return jnp, planes, rotations


def test_vertical_rot_vec_parity(jnp_mods, rng):
    jnp, _, rotations = jnp_mods
    from tools.rot_utils import get_vertical_rot_vec_in_batch

    y = rng.normal(size=(32, 3)).astype(np.float32)
    z = rng.normal(size=(32, 3)).astype(np.float32)
    y /= np.linalg.norm(y, axis=-1, keepdims=True)
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    c1 = rng.uniform(0.05, 1.0, 32).astype(np.float32)
    c2 = rng.uniform(0.05, 1.0, 32).astype(np.float32)

    ty, tz = get_vertical_rot_vec_in_batch(torch.tensor(c1), torch.tensor(c2),
                                           torch.tensor(y), torch.tensor(z))
    jy, jz = rotations.get_vertical_rot_vec(jnp.array(c1), jnp.array(c2),
                                            jnp.array(y), jnp.array(z))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jz), tz.numpy(), atol=2e-5)


def test_rot_mat_y_first_parity(jnp_mods, rng):
    jnp, _, rotations = jnp_mods
    from tools.rot_utils import get_rot_mat_y_first

    y = rng.normal(size=(16, 3)).astype(np.float32)
    x = rng.normal(size=(16, 3)).astype(np.float32)
    tR = get_rot_mat_y_first(torch.tensor(y), torch.tensor(x)).numpy()
    jR = np.asarray(rotations.get_rot_mat_y_first(jnp.array(y), jnp.array(x)))
    np.testing.assert_allclose(jR, tR, atol=2e-5)


def test_generate_RT_parity(jnp_mods, rng):
    jnp, _, rotations = jnp_mods
    from tools.geom_utils import generate_RT

    g = rng.normal(size=(16, 3)).astype(np.float32)
    r = rng.normal(size=(16, 3)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    r /= np.linalg.norm(r, axis=-1, keepdims=True)
    fg = rng.uniform(0.1, 1.0, 16).astype(np.float32)
    fr = rng.uniform(0.1, 1.0, 16).astype(np.float32)
    T = rng.normal(size=(16, 3)).astype(np.float32)
    sym = (rng.random((16, 4)) < 0.5).astype(np.float32)

    tRT = generate_RT([torch.tensor(g), torch.tensor(r)],
                      [torch.tensor(fg), torch.tensor(fr)],
                      torch.tensor(T), mode="vec", sym=torch.tensor(sym)).numpy()
    jRT = np.asarray(rotations.generate_RT(jnp.array(g), jnp.array(r), jnp.array(fg),
                                           jnp.array(fr), jnp.array(T), jnp.array(sym)))
    np.testing.assert_allclose(jRT, tRT, atol=3e-5)


def test_plane_fit_parity(jnp_mods, rng):
    jnp, planes, _ = jnp_mods
    from tools.plane_utils import get_plane_in_batch

    pc = rng.normal(size=(4, 6, 40, 3)).astype(np.float32)
    w = rng.uniform(0.1, 1.0, size=(4, 6, 40)).astype(np.float32)
    tn, tdn, tc = get_plane_in_batch(torch.tensor(pc), torch.tensor(w))
    jn, jdn, jc = planes.fit_plane_weighted(jnp.array(pc), jnp.array(w))
    np.testing.assert_allclose(np.asarray(jn), tn.numpy(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(jdn), tdn.numpy(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=5e-3)


def test_get_gt_v_parity(jnp_mods, rng):
    # tools/training_utils imports mmcv (unavailable); replicate its axis=2 corner
    # matrix computation (training_utils.py:59-73) as the oracle instead.
    jnp, _, rotations = jnp_mods

    A = rng.normal(size=(8, 3, 3))
    Q, _ = np.linalg.qr(A)
    Q = Q.astype(np.float32)
    corners = np.array([[0, 0, 1], [0, 1, 0], [0, 0, 0]], dtype=np.float32)
    gt_vec = np.einsum("bij,jk->bik", Q, corners).transpose(0, 2, 1).reshape(8, 9)
    jg, jr = rotations.get_gt_v(jnp.array(Q))
    np.testing.assert_allclose(np.asarray(jg), gt_vec[:, 3:6], atol=1e-6)
    np.testing.assert_allclose(np.asarray(jr), gt_vec[:, 6:9], atol=1e-6)

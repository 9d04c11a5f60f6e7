"""Rotation-vector geometry (pure JAX).

Semantics match the reference utilities in ``tools/rot_utils.py`` (batched variants:
``get_vertical_rot_vec_in_batch`` :39-64, ``get_rot_mat_y_first`` :76-85,
``to_R_matrices`` :95-98) and ``tools/geom_utils.py`` (``generate_RT`` :232-244,
``batch_dot`` :274-278, ``get_size`` :280-282) and ``tools/training_utils.get_gt_v``
(:59-73).  Everything is batch-vectorized, jit-friendly, f32.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along ``axis`` (torch.nn.functional.normalize semantics)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def batch_dot(a: jnp.ndarray, b: jnp.ndarray, keepdim: bool = False) -> jnp.ndarray:
    """Row-wise dot product over the last axis (tools/geom_utils.py:274-278)."""
    out = jnp.sum(a * b, axis=-1)
    if keepdim:
        return out[..., None]
    return out


def rodrigues_matrix(axis: jnp.ndarray, s: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices about unit ``axis`` with sin ``s`` / cos ``c``.

    axis: (..., 3); s, c: (..., 1).  Returns (..., 3, 3).
    Matches ``tools/rot_utils.to_rot_matrix_in_batch`` (:66-74).
    """
    x, y, z = axis[..., 0:1], axis[..., 1:2], axis[..., 2:3]
    one_c = 1.0 - c
    r1 = jnp.concatenate([x * x * one_c + c, x * y * one_c - z * s, x * z * one_c + y * s], -1)
    r2 = jnp.concatenate([y * x * one_c + z * s, y * y * one_c + c, y * z * one_c - x * s], -1)
    r3 = jnp.concatenate([x * z * one_c - y * s, z * y * one_c + x * s, z * z * one_c + c], -1)
    return jnp.stack([r1, r2, r3], axis=-2)


def get_vertical_rot_vec(c1: jnp.ndarray, c2: jnp.ndarray, y: jnp.ndarray,
                         z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Confidence-weighted re-orthogonalization of the (y, z) axis pair.

    c1, c2: (B,) confidences; y, z: (B, 3) unit-ish vectors.
    Returns (new_y, new_z), each (B, 3), rotated toward mutual perpendicularity by
    Rodrigues rotations about y×z, with the angle split by confidence ratio.
    Matches ``tools/rot_utils.get_vertical_rot_vec_in_batch`` (:39-64) including the
    acos clamp at 1-1e-6.
    """
    c1 = c1[..., None]
    c2 = c2[..., None]
    rot_x = jnp.cross(y, z)
    rot_x = rot_x / (jnp.linalg.norm(rot_x, axis=-1, keepdims=True) + 1e-8)
    y_z_cos = jnp.clip(jnp.sum(y * z, axis=-1, keepdims=True), -1 + 1e-6, 1 - 1e-6)
    y_z_theta = jnp.arccos(y_z_cos)
    theta_2 = c1 / (c1 + c2) * (y_z_theta - math.pi / 2)
    theta_1 = c2 / (c1 + c2) * (y_z_theta - math.pi / 2)

    rot_y = rodrigues_matrix(rot_x, jnp.sin(theta_1), jnp.cos(theta_1))
    new_y = jnp.einsum("...ij,...j->...i", rot_y, y)
    rot_z = rodrigues_matrix(rot_x, jnp.sin(-theta_2), jnp.cos(-theta_2))
    new_z = jnp.einsum("...ij,...j->...i", rot_z, z)
    return new_y, new_z


def get_rot_mat_y_first(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Assemble R = [x' y' z'] columns from a trusted y axis and an x hint.

    Matches ``tools/rot_utils.get_rot_mat_y_first`` (:76-85): y normalized,
    z = norm(x × y), x = y × z; columns stacked (..., 3, 3).
    """
    y = normalize(y)
    z = normalize(jnp.cross(x, y))
    x = jnp.cross(y, z)
    return jnp.stack([x, y, z], axis=-1)


def to_R_matrices(f_g: jnp.ndarray, f_r: jnp.ndarray, p_g: jnp.ndarray,
                  p_r: jnp.ndarray) -> jnp.ndarray:
    """Confidence-weighted rotation assembly (tools/rot_utils.py:95-98)."""
    new_y, new_x = get_vertical_rot_vec(f_g, f_r, p_g, p_r)
    return get_rot_mat_y_first(new_y, new_x)


def generate_RT(green_vec: jnp.ndarray, red_vec: jnp.ndarray, f_green: jnp.ndarray,
                f_red: jnp.ndarray, T: jnp.ndarray, sym: jnp.ndarray) -> jnp.ndarray:
    """Batched homogeneous pose assembly from the two axis heads.

    Matches ``tools/geom_utils.generate_RT`` (:232-244) in 'vec' mode: for
    axis-symmetric objects (sym[:, 0] == 1) the red confidence is zeroed so the
    y axis wholly trusts the green head.  Returns (B, 4, 4).
    """
    f_red = jnp.where(sym[:, 0] == 1, jnp.zeros_like(f_red), f_red)
    Rs = to_R_matrices(f_green, f_red, green_vec, red_vec)
    bs = T.shape[0]
    res = jnp.tile(jnp.eye(4, dtype=T.dtype)[None], (bs, 1, 1))
    res = res.at[:, :3, :3].set(Rs)
    res = res.at[:, :3, 3].set(T)
    return res


def get_gt_v(Rs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extract gt green (y column) and red (x column) axis vectors from R.

    Matches ``tools/training_utils.get_gt_v`` (:59-73) at the live call site
    (network/HSPose.py:102, default axis=2): the corner matrix C =
    [[0,0,1],[0,1,0],[0,0,0]] has columns [0,0,0], [0,1,0], [1,0,0]; the flattened
    (R@C)^T therefore yields gt_green = R·e_y (y column of R) and gt_red = R·e_x
    (x column of R).
    """
    gt_green = Rs[..., :, 1]
    gt_red = Rs[..., :, 0]
    return gt_green, gt_red


def get_size(model: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned extents of a model point cloud (tools/geom_utils.py:280-282)."""
    return jnp.max(model, axis=-2) - jnp.min(model, axis=-2)

"""Geometric consistency loss (pure JAX).

Matches ``losses/geometry_loss.cal_geo_loss_point`` (:123-150): project the cloud
into the object frame by the gt pose and compare its y coordinates against the
projection onto the predicted green axis (L1); the x-coordinate term is masked to
non-axis-symmetric samples with the bs/valid rescale.
"""

from __future__ import annotations

import jax.numpy as jnp

from hspose_tpu.config import LossConfig
from hspose_tpu.losses.fs_net_loss import _rescale_by_valid, l1


def geo_loss_point(points, p_rot_g, p_rot_r, p_t, g_R, g_t, sym):
    bs = points.shape[0]
    centered = points - g_t[:, None, :]
    points_re = jnp.einsum("bij,bnj->bni", jnp.swapaxes(g_R, -1, -2), centered)

    points_re_y = jnp.sum((points - p_t[:, None, :]) * p_rot_g[:, None, :], axis=-1)
    res_geo_y = l1(points_re_y, points_re[:, :, 1])

    points_re_x = jnp.sum((points - p_t[:, None, :]) * p_rot_r[:, None, :], axis=-1)
    flag = sym[:, 0] == 0
    points_re_x = jnp.where(flag[:, None], points_re_x, 0.0)
    new_points_re = jnp.where(flag[:, None, None], points_re, 0.0)
    res_geo_x = _rescale_by_valid(l1(points_re_x, new_points_re[..., 0]), flag, bs)
    return res_geo_y + res_geo_x


def geo_transform_loss(cfg: LossConfig, name_list, pred, gt, sym):
    out = {}
    if "Geo_point" in name_list:
        out["geo_point"] = cfg.geo_p_w * geo_loss_point(
            gt["Points"], pred["Rot1"], pred["Rot2"], pred["Tran"], gt["R"], gt["T"], sym)
    return out

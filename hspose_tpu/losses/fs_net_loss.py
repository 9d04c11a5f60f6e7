"""FS-Net pose losses (pure JAX).

Matches ``losses/fs_net_loss.py`` of the reference: L1 (or SmoothL1) losses on the
two rotation axes (red masked to non-axis-symmetric samples with a bs/valid rescale,
:145-153), cosine variants (:166-199), the |green·red| orthogonality regularizer
(:217-226), translation/size L1 (:231-235), and confidence regression against
exp(-13.7·‖err‖²) targets (:95-110).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from hspose_tpu.config import LossConfig
from hspose_tpu.geometry.rotations import batch_dot


def l1(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def smooth_l1(pred, gt, beta):
    d = jnp.abs(pred - gt)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def _base_loss(cfg: LossConfig):
    if cfg.fsnet_loss_type == "l1":
        return l1
    if cfg.fsnet_loss_type == "smoothl1":
        return lambda p, g: smooth_l1(p, g, 0.5)
    raise NotImplementedError(cfg.fsnet_loss_type)


def _rescale_by_valid(res, flag, bs):
    """Masked-mean rescale: res computed as mean over all (zeros where masked), then
    multiplied by bs/valid when any sample is valid (fs_net_loss.py:151-153)."""
    valid = jnp.sum(flag.astype(res.dtype))
    return jnp.where(valid > 0, res * bs / jnp.maximum(valid, 1.0), res)


def loss_rot2(loss_fn, pred_v, gt_v, sym, bs):
    flag = (sym[:, 0] == 0)[:, None]
    res = loss_fn(jnp.where(flag, pred_v, 0.0), jnp.where(flag, gt_v, 0.0))
    return _rescale_by_valid(res, flag[:, 0], bs)


def cosine_dis(pred_v, gt_v):
    return jnp.mean((1.0 - batch_dot(pred_v, gt_v)) * 2.0)


def cosine_dis_sym(pred_v, gt_v, sym, bs):
    res = (1.0 - batch_dot(pred_v, gt_v)) * 2.0
    flag = sym[:, 0] == 0
    res = jnp.mean(jnp.where(flag, res, 0.0))
    return _rescale_by_valid(res, flag, bs)


def rot_regular_angle(pred_v1, pred_v2, sym, bs):
    res = jnp.abs(batch_dot(pred_v1, pred_v2))
    flag = sym[:, 0] == 0
    res = jnp.mean(jnp.where(flag, res, 0.0))
    return _rescale_by_valid(res, flag, bs)


def loss_r_con(loss_fn, p_rot_g, p_rot_r, g_rot_g, g_rot_r, p_g_con, p_r_con, sym):
    dis_g = jnp.linalg.norm(p_rot_g - g_rot_g, axis=-1)
    res_g = loss_fn(jnp.exp(-13.7 * dis_g * dis_g), p_g_con)
    dis_r = jnp.linalg.norm(p_rot_r - g_rot_r, axis=-1)
    p_r_con_gt = jnp.exp(-13.7 * dis_r * dis_r)
    flag = sym[:, 0] == 0
    res_r = loss_fn(jnp.where(flag, p_r_con_gt, 0.0), jnp.where(flag, p_r_con, 0.0))
    return res_g + res_r


def fs_net_loss(cfg: LossConfig, name_list, pred, gt, sym) -> Dict[str, jnp.ndarray]:
    """pred/gt: dicts with Rot1, Rot2, Rot1_f, Rot2_f, Tran, Size (fs_net_loss.py:31-77)."""
    f = _base_loss(cfg)
    bs = pred["Rot1"].shape[0]
    out = {}
    if "Rot1" in name_list:
        out["Rot1"] = cfg.rot_1_w * f(pred["Rot1"], gt["Rot1"])
    if "Rot1_cos" in name_list:
        out["Rot1_cos"] = cfg.rot_1_w * cosine_dis(pred["Rot1"], gt["Rot1"])
    if "Rot2" in name_list:
        out["Rot2"] = cfg.rot_2_w * loss_rot2(f, pred["Rot2"], gt["Rot2"], sym, bs)
    if "Rot2_cos" in name_list:
        out["Rot2_cos"] = cfg.rot_2_w * cosine_dis_sym(pred["Rot2"], gt["Rot2"], sym, bs)
    if "Rot_regular" in name_list:
        out["Rot_r_a"] = cfg.rot_regular * rot_regular_angle(pred["Rot1"], pred["Rot2"],
                                                             sym, bs)
    if "Recon" in name_list:  # defined but outside the PoseNet_only set (ref :54-61)
        out["Recon"] = cfg.recon_w * f(pred["Recon"], gt["Recon"])
    if "Tran" in name_list:
        out["Tran"] = cfg.tran_w * f(pred["Tran"], gt["Tran"])
    if "Size" in name_list:
        out["Size"] = cfg.size_w * f(pred["Size"], gt["Size"])
    if "R_con" in name_list:
        out["R_con"] = cfg.r_con_w * loss_r_con(f, pred["Rot1"], pred["Rot2"],
                                                gt["Rot1"], gt["Rot2"],
                                                pred["Rot1_f"], pred["Rot2_f"], sym)
    return out

"""Prop (point-matching + symmetry) losses (pure JAX).

Matches ``losses/prop_loss.py``: ``prop_point_matching_loss`` (:156-186) builds the
predicted rotation from the confidence-weighted orthogonalized axes (axis-symmetric
samples substitute the gt x column with near-zero confidence) and L1-compares the
cloud projected by the predicted vs gt pose; ``prop_sym_matching_loss`` (:188-276)
compares the reconstructed cloud against symmetry-reflected gt targets and enforces
reflection-plane consistency of the predicted axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from hspose_tpu.config import LossConfig
from hspose_tpu.geometry.rotations import (
    batch_dot,
    get_rot_mat_y_first,
    get_vertical_rot_vec,
)
from hspose_tpu.losses.fs_net_loss import l1


def _project(R, t, points):
    """Rᵀ (points - t): world → object frame, batched."""
    return jnp.einsum("bij,bnj->bni", jnp.swapaxes(R, -1, -2), points - t[:, None, :])


def prop_point_matching_loss(points, p_g_vec, f_g_vec, p_r_vec, f_r_vec, p_t, g_R,
                             g_t, sym):
    points_re = _project(g_R, g_t, points)

    near_zero = jnp.full_like(f_g_vec, 1e-5)
    ny_sym, nx_sym = get_vertical_rot_vec(f_g_vec, near_zero, p_g_vec, g_R[..., 0])
    ny, nx = get_vertical_rot_vec(f_g_vec, f_r_vec, p_g_vec, p_r_vec)
    sym_flag = (sym[:, 0] == 1)[:, None]
    new_y = jnp.where(sym_flag, ny_sym, ny)
    new_x = jnp.where(sym_flag, nx_sym, nx)
    p_R = get_rot_mat_y_first(new_y, new_x)
    points_re_n = _project(p_R, p_t, points)
    return l1(points_re_n, points_re)


def _y_reflection_flag(sym):
    """can/bowl/bottle: axis-symmetric with at least one reflection plane (:196)."""
    return jnp.logical_and(sym[:, 0] == 1, jnp.sum(sym[:, 1:], axis=-1) > 0)


def _yx_reflection_flag(sym):
    """laptop / mug-with-handle: xy-plane reflection only (:207)."""
    return jnp.logical_and(sym[:, 0] == 0, sym[:, 1] == 1)


def prop_sym_matching_loss(PC, PC_re, p_g_vec, p_r_vec, p_t, gt_R, gt_t, sym):
    """Returns (res_p_recon, res_p_rt)."""
    cano = _project(gt_R, gt_t, PC)  # (B, N, 3)

    # --- recon target: reflected gt cloud -------------------------------------------
    y_flag = _y_reflection_flag(sym)[:, None, None]
    yx_flag = _yx_reflection_flag(sym)[:, None, None]
    no_flag = jnp.logical_and(sym[:, 0] == 0, sym[:, 1] != 1)[:, None, None]

    y_ref = cano * jnp.array([-1.0, 1.0, -1.0])
    yx_ref = cano * jnp.array([1.0, 1.0, -1.0])

    def _to_world(pts):
        return jnp.einsum("bij,bnj->bni", gt_R, pts) + gt_t[:, None, :]

    gt_pc = (jnp.where(y_flag, _to_world(y_ref), 0.0)
             + jnp.where(yx_flag, _to_world(yx_ref), 0.0)
             + jnp.where(no_flag, PC, 0.0))
    # mug without visible handle excluded entirely (prop_loss.py:226-227)
    excluded = jnp.logical_and(sym[:, 0] == 1, jnp.sum(sym[:, 1:], axis=-1) == 0)[:, None, None]
    pc_re_masked = jnp.where(excluded, 0.0, PC_re)
    res_p_recon = l1(gt_pc, pc_re_masked)

    # --- rt consistency: reflect PC through the predicted symmetry element ----------
    # y-axis reflection (180° about the predicted green axis), prop_loss.py:231-240
    pc_t_res = PC - p_t[:, None, :]
    along_g = batch_dot(pc_t_res, p_g_vec[:, None, :], keepdim=True) * p_g_vec[:, None, :]
    pc_b_y = PC + 2.0 * (along_g - pc_t_res)

    # xy-plane reflection through the predicted plane normal z = x̂ × ŷ, :242-251
    p_z = jnp.cross(p_r_vec, p_g_vec)
    p_z = p_z / (jnp.linalg.norm(p_z, axis=-1, keepdims=True) + 1e-8)
    t_plane = -(batch_dot(PC, p_z[:, None, :], keepdim=True)
                - batch_dot(p_z, p_t)[:, None, None])
    pc_b_yx = PC + 2.0 * p_z[:, None, :] * t_plane

    pc_b = (jnp.where(y_flag, pc_b_y, 0.0) + jnp.where(yx_flag, pc_b_yx, 0.0))
    pc_re_rt = (jnp.where(y_flag, PC_re, 0.0) + jnp.where(yx_flag, PC_re, 0.0))
    res_p_rt = l1(pc_b, pc_re_rt)
    return res_p_recon, res_p_rt


def prop_rot_reg_loss(f_g_vec, f_r_vec):
    return jnp.mean(jnp.abs(1.0 - (f_g_vec + f_r_vec)))


def prop_rot_loss(cfg: LossConfig, name_list, pred, gt, sym):
    out = {}
    if "Prop_pm" in name_list:
        out["Prop_pm"] = cfg.prop_pm_w * prop_point_matching_loss(
            gt["Points"], pred["Rot1"], pred["Rot1_f"], pred["Rot2"], pred["Rot2_f"],
            pred["Tran"], gt["R"], gt["T"], sym)
    if "Prop_r_reg" in name_list:
        out["Prop_r_reg"] = cfg.prop_r_reg_w * prop_rot_reg_loss(pred["Rot1_f"],
                                                                 pred["Rot2_f"])
    if "Prop_sym" in name_list and cfg.prop_sym_w > 0:
        recon, rt = prop_sym_matching_loss(gt["Points"], pred["Recon"], pred["Rot1"],
                                           pred["Rot2"], pred["Tran"], gt["R"],
                                           gt["T"], sym)
        out["Prop_sym_recon"] = cfg.prop_sym_w * recon
        out["Prop_sym_rt"] = cfg.prop_sym_w * rt
    return out

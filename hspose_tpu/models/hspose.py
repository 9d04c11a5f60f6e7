"""HSPose wrapper: augmentation → PoseNet9D → loss orchestration.

Functional equivalent of ``network/HSPose.py`` (:23-256): the train forward applies
the fused batched augmentation (under stop_gradient — the reference runs it in
``torch.no_grad``), runs the posenet, assembles the pred/gt dicts (detaching the two
rotation confidences exactly where the reference does, :121-141) and evaluates the
four loss families selected by ``control_loss``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hspose_tpu.config import HSPoseConfig
from hspose_tpu.data.augment import augment_batch
from hspose_tpu.geometry.rotations import get_gt_v
from hspose_tpu.losses import (
    control_loss,
    fs_net_loss,
    geo_transform_loss,
    prop_rot_loss,
    recon_6face_loss,
)
from hspose_tpu.models.posenet import PoseNet9D, PoseNetOutput

LossDicts = Dict[str, Dict[str, jnp.ndarray]]


def build_model(cfg: HSPoseConfig) -> PoseNet9D:
    return PoseNet9D(cfg.model)


def compute_losses(cfg: HSPoseConfig, out: PoseNetOutput, pc, gt_R, gt_t, gt_s,
                   mean_shape, sym, obj_id) -> LossDicts:
    """Assemble pred/gt dicts and evaluate the four loss families
    (network/HSPose.py:84-179)."""
    name_fs, name_recon, name_geo, name_prop = control_loss(cfg.train.train_stage)

    gt_green, gt_red = get_gt_v(gt_R)
    f_green_det = jax.lax.stop_gradient(out.f_green_R)
    f_red_det = jax.lax.stop_gradient(out.f_red_R)

    pred_fsnet = {
        "Rot1": out.p_green_R, "Rot1_f": out.f_green_R,
        "Rot2": out.p_red_R, "Rot2_f": out.f_red_R,
        "Recon": out.recon, "Tran": out.pred_T, "Size": out.pred_s,
    }
    gt_fsnet = {"Rot1": gt_green, "Rot2": gt_red, "Recon": pc, "Tran": gt_t,
                "Size": gt_s}
    fsnet = fs_net_loss(cfg.loss, name_fs, pred_fsnet, gt_fsnet, sym)

    pred_prop = {
        "Recon": out.recon, "Rot1": out.p_green_R, "Rot2": out.p_red_R,
        "Tran": out.pred_T, "Scale": out.pred_s,
        "Rot1_f": f_green_det, "Rot2_f": f_red_det,
    }
    gt_prop = {"Points": pc, "R": gt_R, "T": gt_t, "Mean_shape": mean_shape}
    prop = prop_rot_loss(cfg.loss, name_prop, pred_prop, gt_prop, sym)

    pred_recon = {
        "F_n": out.face_normal, "F_d": out.face_dis, "F_c": out.face_f,
        "Rot1": out.p_green_R, "Rot1_f": f_green_det,
        "Rot2": out.p_red_R, "Rot2_f": f_red_det,
        "Tran": out.pred_T, "Size": out.pred_s,
    }
    gt_recon = {"R": gt_R, "T": gt_t, "Size": gt_s, "Mean_shape": mean_shape,
                "Points": pc}
    recon = recon_6face_loss(cfg.loss, name_recon, pred_recon, gt_recon, sym, obj_id)

    pred_geo = {
        "Rot1": out.p_green_R, "Rot2": out.p_red_R, "Tran": out.pred_T,
        "Size": out.pred_s, "Rot1_f": f_green_det, "Rot2_f": f_red_det,
    }
    gt_geo = {"Points": pc, "R": gt_R, "T": gt_t, "Mean_shape": mean_shape}
    geo = geo_transform_loss(cfg.loss, name_geo, pred_geo, gt_geo, sym)

    return {"fsnet_loss": fsnet, "recon_loss": recon, "geo_loss": geo,
            "prop_loss": prop}


def total_loss(loss_dicts: LossDicts) -> jnp.ndarray:
    """Sum of all scalar terms (engine/train.py:96-97)."""
    return sum(v for d in loss_dicts.values() for v in d.values())


def train_forward(cfg: HSPoseConfig, model: PoseNet9D, params, batch_stats,
                  rngs: Dict[str, jax.Array], batch: Dict[str, jnp.ndarray]
                  ) -> Tuple[jnp.ndarray, Tuple[LossDicts, dict]]:
    """One differentiable train forward: augmentation, posenet, losses.

    ``batch`` carries the 12 tensors of the reference train loader
    (datasets/load_data.py:285-299): pcl_in, cat_id, rotation, translation,
    fsnet_scale, mean_shape, sym_info, aug_bb, aug_rt_t, aug_rt_R, model_point,
    nocs_scale.  Returns (total_loss, (loss_dicts, new_batch_stats)).

    Fused preprocessing: when the loader runs in ``sample_mode='device'`` the batch
    ships roi_depth/roi_mask/roi_coord/cam_k crops instead of ``pcl_in`` and the
    depth→cloud back-projection + fixed-size sampling happen here, on device,
    inside the same jitted step (the reference's host-side ``_depth_to_pcl`` /
    net-side ``PC_sample``).
    """
    if "pcl_in" not in batch:
        from hspose_tpu.data.preprocess import roi_to_pointcloud

        pcl, _ = roi_to_pointcloud(rngs["augment"], batch["roi_depth"],
                                   batch["roi_mask"], batch["roi_coord"],
                                   batch["cam_k"], cfg.data.num_points)
        batch = dict(batch, pcl_in=pcl)

    obj_id = batch["cat_id"].astype(jnp.int32)
    aug = augment_batch(
        rngs["augment"], cfg.aug,
        jax.lax.stop_gradient(batch["pcl_in"]), batch["rotation"],
        batch["translation"], batch["fsnet_scale"], batch["mean_shape"],
        batch["sym_info"], batch["aug_bb"], batch["aug_rt_t"], batch["aug_rt_R"],
        batch["model_point"], batch["nocs_scale"], obj_id)

    variables = {"params": params, "batch_stats": batch_stats}
    out, mutated = model.apply(
        variables, aug.pc, obj_id, True,
        rngs={"pool": rngs["pool"], "dropout": rngs["dropout"]},
        mutable=["batch_stats"])

    loss_dicts = compute_losses(cfg, out, aug.pc, aug.gt_R, aug.gt_t, aug.gt_s,
                                batch["mean_shape"], batch["sym_info"], obj_id)
    return total_loss(loss_dicts), (loss_dicts, mutated["batch_stats"])


def eval_forward(model: PoseNet9D, params, batch_stats, pool_key: jax.Array,
                 pc: jnp.ndarray, obj_id: jnp.ndarray,
                 with_heads: bool = False,
                 sp_axis: str | None = None) -> PoseNetOutput:
    """Inference forward (no train heads, running BN stats, keyed pooling).

    ``with_heads=True`` additionally runs the recon/face heads deterministically
    (the ``eval_recon`` producer) — needs an unpruned training checkpoint.
    ``sp_axis``: sequence-parallel serving inside shard_map — ``pc`` holds this
    device's point shard (see parallel/sp.py)."""
    variables = {"params": params, "batch_stats": batch_stats}
    return model.apply(variables, pc, obj_id.astype(jnp.int32), False,
                       with_heads, sp_axis, rngs={"pool": pool_key})

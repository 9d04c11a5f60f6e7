"""Batched on-device point-cloud augmentation (fused, jit-compiled).

This is the BASELINE.json north-star 'fused augmentation' stage: the four
Bernoulli-gated batched transforms of ``HSPose.data_augment``
(network/HSPose.py:230-248) — bb rescale (p=0.3) → R/t perturbation (p=0.3) →
box-cage taper (p=0.3, bowl/mug only) → per-point radial jitter (p=0.2) — with the
transform math of ``datasets/data_augmentation.py`` (``defor_3D_bb_in_batch`` :70-79,
``defor_3D_rt_in_batch`` :183-190, ``defor_3D_bc_in_batch`` :106-126, ``defor_3D_pc``
:133-140).  All randomness is drawn from an explicit PRNG key; the whole thing jits
into a handful of fused elementwise kernels around two small batched matmuls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hspose_tpu.config import AugConfig


class AugmentedBatch(NamedTuple):
    pc: jnp.ndarray
    gt_R: jnp.ndarray
    gt_t: jnp.ndarray
    gt_s: jnp.ndarray


def _to_object(R, t, pc):
    return jnp.einsum("bij,bnj->bni", jnp.swapaxes(R, -1, -2), pc - t[:, None, :])


def _to_world(R, t, pc):
    return jnp.einsum("bij,bnj->bni", R, pc) + t[:, None, :]


def defor_bb(pc, model_point, R, t, s, sym, aug_bb):
    """Anisotropic bbox rescale with x/z averaged for axis-symmetric objects
    (data_augmentation.py:70-79).  ``s`` is the full size (gt_s + mean_shape)."""
    pc_obj = _to_object(R, t, pc)
    sym_aug = (aug_bb + aug_bb[:, [2, 1, 0]]) / 2.0
    ex = jnp.where((sym[:, 0] == 1)[:, None], sym_aug, aug_bb)
    pc_new = _to_world(R, t, pc_obj * ex[:, None, :])
    return pc_new, s * ex, model_point * ex[:, None, :]


def defor_rt(pc, R, t, aug_rt_t, aug_rt_r):
    """Random rigid perturbation (data_augmentation.py:183-190)."""
    pc_new = jnp.einsum("bij,bnj->bni", aug_rt_r, pc + aug_rt_t[:, None, :])
    R_new = jnp.einsum("bij,bjk->bik", aug_rt_r, R)
    t_new = jnp.einsum("bij,bj->bi", aug_rt_r, t + aug_rt_t)
    return pc_new, R_new, t_new


def defor_bc(key, pc, R, t, s, model_point, nocs_scale, ey_up=None, ey_down=None):
    """Box-cage taper along y for bowls/mugs (data_augmentation.py:106-126).

    ``ey_up``/``ey_down`` may be injected (parity tests); drawn from ``key``
    otherwise."""
    bs = pc.shape[0]
    k1, k2 = jax.random.split(key)
    if ey_up is None:
        ey_up = jax.random.uniform(k1, (bs, 1), minval=0.8, maxval=1.2)
    if ey_down is None:
        ey_down = jax.random.uniform(k2, (bs, 1), minval=0.8, maxval=1.2)

    pc_obj = _to_object(R, t, pc)
    s_y = s[:, 1:2]
    per_point = (pc_obj[..., 1] + s_y / 2.0) / s_y * (ey_up - ey_down) + ey_down
    pc_obj = pc_obj.at[..., 0].mul(per_point)
    pc_obj = pc_obj.at[..., 2].mul(per_point)
    pc_new = _to_world(R, t, pc_obj)

    mp = model_point
    mp_resize = (mp[..., 1] + s_y / 2.0) / s_y * (ey_up - ey_down) + ey_down
    mp = mp.at[..., 0].mul(mp_resize)
    mp = mp.at[..., 2].mul(mp_resize)
    s_new = (jnp.max(mp, axis=1) - jnp.min(mp, axis=1)) * nocs_scale[:, None]
    return pc_new, s_new


def defor_pc(key, pc, gt_t, r, defor=None):
    """Per-point radial jitter toward/away from the object centre
    (data_augmentation.py:133-140): pc + U[0, r)·(pc − t).  ``defor`` may be
    injected for deterministic testing (the reference exposes ``points_defor``)."""
    if defor is None:
        defor = jax.random.uniform(key, pc.shape) * r
    return pc + defor * (pc - gt_t[:, None, :])


def augment_batch(key: jax.Array, cfg: AugConfig, pc, gt_R, gt_t, gt_s, mean_shape,
                  sym, aug_bb, aug_rt_t, aug_rt_r, model_point, nocs_scale,
                  obj_ids) -> AugmentedBatch:
    """Full fused augmentation pipeline (network/HSPose.py:230-248).

    gt_s is the FS-Net *residual*; sizes are de-residualed around mean_shape for the
    geometric transforms exactly as the reference does.
    """
    bs = pc.shape[0]
    k_bb, k_rt, k_bc, k_pc, k_bc_draw, k_pc_draw = jax.random.split(key, 6)

    # 1. bbox rescale
    flag = (jax.random.uniform(k_bb, (bs, 1)) < cfg.bb_pro)
    pc_new, s_new, mp_new = defor_bb(pc, model_point, gt_R, gt_t, gt_s + mean_shape,
                                     sym, aug_bb)
    pc = jnp.where(flag[..., None], pc_new, pc)
    gt_s = jnp.where(flag, s_new - mean_shape, gt_s)
    model_point = jnp.where(flag[..., None], mp_new, model_point)

    # 2. rigid perturbation
    flag = (jax.random.uniform(k_rt, (bs, 1)) < cfg.rt_pro)
    pc_new, R_new, t_new = defor_rt(pc, gt_R, gt_t, aug_rt_t, aug_rt_r)
    pc = jnp.where(flag[..., None], pc_new, pc)
    gt_R = jnp.where(flag[..., None], R_new, gt_R)
    gt_t = jnp.where(flag, t_new, gt_t)

    # 3. box-cage taper: only mug (5) / bowl (1), HSPose.py:242-244
    is_bc_class = jnp.logical_or(obj_ids == 5, obj_ids == 1)[:, None]
    flag = jnp.logical_and(jax.random.uniform(k_bc, (bs, 1)) < cfg.bc_pro, is_bc_class)
    pc_new, s_new = defor_bc(k_bc_draw, pc, gt_R, gt_t, gt_s + mean_shape,
                             model_point, nocs_scale)
    pc = jnp.where(flag[..., None], pc_new, pc)
    gt_s = jnp.where(flag, s_new - mean_shape, gt_s)

    # 4. per-point jitter
    flag = (jax.random.uniform(k_pc, (bs, 1)) < cfg.pc_pro)
    pc_new = defor_pc(k_pc_draw, pc, gt_t, cfg.pc_r)
    pc = jnp.where(flag[..., None], pc_new, pc)

    return AugmentedBatch(pc, gt_R, gt_t, gt_s)

"""PoseNet9D: backbone + decoupled rotation / translation / size heads.

Matches ``network/fs_net_repo/PoseNet9D.py`` (:14-52): points are centred before the
backbone; at train time the recon cloud is de-centred and the 30-d face tensor is
split into unit normals (18), distances (6) and sigmoid confidences (6); the two
rotation heads emit [confidence, axis] 4-vectors; the Ts head consumes
concat(feat, centred points) and its translation residual is added back to the
cloud mean.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hspose_tpu.config import ModelConfig
from hspose_tpu.models.face_recon import FaceRecon
from hspose_tpu.models.heads import PoseTsHead, RotationHead


class PoseNetOutput(NamedTuple):
    recon: Optional[jnp.ndarray]        # (B, N, 3) world-frame recon (train only)
    face_normal: Optional[jnp.ndarray]  # (B, N, 6, 3) unit normals (train only)
    face_dis: Optional[jnp.ndarray]     # (B, N, 6) distances (train only)
    face_f: Optional[jnp.ndarray]       # (B, N, 6) confidences (train only)
    p_green_R: jnp.ndarray              # (B, 3) unit green axis
    p_red_R: jnp.ndarray                # (B, 3) unit red axis
    f_green_R: jnp.ndarray              # (B,) confidence
    f_red_R: jnp.ndarray                # (B,) confidence
    pred_T: jnp.ndarray                 # (B, 3) translation
    pred_s: jnp.ndarray                 # (B, 3) size residual


class PoseNet9D(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, points: jnp.ndarray, obj_id: jnp.ndarray,
                 train: bool, with_heads: bool = False,
                 sp_axis: Optional[str] = None) -> PoseNetOutput:
        """``sp_axis``: sequence-parallel serving (inside shard_map) — ``points``
        holds this device's shard of the point axis; the centering mean and the
        heads' global max-pools finish with collectives, and the backbone runs
        local queries against all-gathered sources (see FaceRecon).  All
        per-crop outputs are replicated across the sp axis."""
        center = jnp.mean(points, axis=1, keepdims=True)
        if sp_axis is not None:
            center = jax.lax.pmean(center, sp_axis)  # equal shards: exact mean
        centred = points - center

        recon, face, feat = FaceRecon(self.cfg, name="face_recon")(
            centred, obj_id, train, with_heads, sp_axis=sp_axis)

        if train or with_heads:
            B, N = points.shape[:2]
            recon = recon + center
            face_normal = face[..., :18].reshape(B, N, 6, 3)
            face_normal = face_normal / jnp.linalg.norm(face_normal, axis=-1, keepdims=True)
            face_dis = face[..., 18:24]
            face_f = jax.nn.sigmoid(face[..., 24:])
        else:
            recon = face_normal = face_dis = face_f = None

        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        green_vec = RotationHead(dtype=dtype, name="rot_green")(feat, train,
                                                                sp_axis)  # (B, 4)
        red_vec = RotationHead(dtype=dtype, name="rot_red")(feat, train, sp_axis)
        p_green_R = green_vec[:, 1:] / (jnp.linalg.norm(green_vec[:, 1:], axis=-1,
                                                        keepdims=True) + 1e-6)
        p_red_R = red_vec[:, 1:] / (jnp.linalg.norm(red_vec[:, 1:], axis=-1,
                                                    keepdims=True) + 1e-6)
        f_green_R = jax.nn.sigmoid(green_vec[:, 0])
        f_red_R = jax.nn.sigmoid(red_vec[:, 0])

        # the reference concatenates (feat | centred) into a (B, N, 1289)
        # buffer (PoseNet9D.py:40); here the Ts head folds the 3 xyz channels
        # into its first matmul instead — same parameters, no 84 MB concat
        # materialization (trace: scripts/trace_serve_batch.py)
        T, s = PoseTsHead(dtype=dtype, name="ts")(feat, train, sp_axis,
                                                  xyz=centred.astype(feat.dtype))
        pred_T = T + center[:, 0, :]

        return PoseNetOutput(recon, face_normal, face_dis, face_f, p_green_R, p_red_R,
                             f_green_R, f_red_R, pred_T, s)

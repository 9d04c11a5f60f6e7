"""Pose heads: rotation axis twins + translation/size.

Matches ``network/fs_net_repo/PoseR.py`` (:10-70, Rot_green / Rot_red: identical
Conv1d 1286→1024→256 | max-pool over points | 256→256→4 with dropout 0.2) and
``PoseTs.py`` (:12-45, 1289→1024→256 | max-pool | 256→256→6 split t/s).

Channel-last: Conv1d(k=1) ≡ Dense; the global max-pool over points happens between
the second and third block exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from hspose_tpu.models.face_recon import _bn
from hspose_tpu.models.layers import torch_linear_init


class _SplitDense(nn.Module):
    """Dense over a logically-concatenated [x | extra] input WITHOUT
    materializing the concat: y = x @ W[:Cx] + extra @ W[Cx:] + b.

    Parameter-compatible with ``nn.Dense`` applied to the concat — same
    "kernel" (Cx+Ce, features) / "bias" names, shapes and init stream — so
    torch-converted and historical checkpoints load unchanged.  Motivation:
    the Ts head's (B, N, 1286+3) input was the single largest XLA glue op in
    the serving trace (concatenate.28, an ~84 MB bf16 materialization;
    scripts/trace_serve_batch.py).  The split changes only the final f32
    accumulation order (≤1 ulp)."""

    features: int
    kernel_init: nn.initializers.Initializer
    bias_init: nn.initializers.Initializer
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray, extra: jnp.ndarray) -> jnp.ndarray:
        cx, ce = x.shape[-1], extra.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (cx + ce, self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        y = (x.astype(self.dtype) @ k[:cx]
             + extra.astype(self.dtype) @ k[cx:])
        return y + bias.astype(self.dtype)


class VecHead(nn.Module):
    """Shared architecture of Rot_green / Rot_red / Pose_Ts."""

    out_c: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 sp_axis: str | None = None,
                 xyz: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: (B, N, C) per-point features -> (B, out_c) f32.

        ``sp_axis``: x holds this device's point shard; the global max-pool
        finishes with a pmax collective (sequence-parallel serving).
        ``xyz``: optional extra per-point channels folded into the first
        layer as a split matmul (the Ts head's centred points) instead of a
        materialized concat."""
        in_c = x.shape[-1] + (0 if xyz is None else xyz.shape[-1])
        if xyz is None:
            x = nn.Dense(1024, kernel_init=torch_linear_init(in_c),
                         bias_init=torch_linear_init(in_c), dtype=self.dtype,
                         name="conv1")(x)
        else:
            x = _SplitDense(1024, kernel_init=torch_linear_init(in_c),
                            bias_init=torch_linear_init(in_c),
                            dtype=self.dtype, name="conv1")(x, xyz)
        x = jax.nn.relu(_bn("bn1", train, self.dtype)(x))
        x = nn.Dense(256, kernel_init=torch_linear_init(1024),
                     bias_init=torch_linear_init(1024), dtype=self.dtype,
                     name="conv2")(x)
        x = jax.nn.relu(_bn("bn2", train, self.dtype)(x))

        x = jnp.max(x, axis=1, keepdims=True)  # global max over points (B, 1, 256)
        if sp_axis is not None:
            x = jax.lax.pmax(x, sp_axis)

        x = nn.Dense(256, kernel_init=torch_linear_init(256),
                     bias_init=torch_linear_init(256), dtype=self.dtype,
                     name="conv3")(x)
        x = jax.nn.relu(_bn("bn3", train, self.dtype)(x))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.Dense(self.out_c, kernel_init=torch_linear_init(256),
                     bias_init=torch_linear_init(256), dtype=self.dtype,
                     name="conv4")(x)
        return x[:, 0, :].astype(jnp.float32)  # (B, out_c)


class RotationHead(nn.Module):
    """Rot_green / Rot_red: 4-vector = [confidence, axis(3)]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool,
                 sp_axis: str | None = None) -> jnp.ndarray:
        return VecHead(4, dtype=self.dtype, name="vec")(feat, train, sp_axis)


class PoseTsHead(nn.Module):
    """Pose_Ts: 6-vector split into translation residual (3) and size residual (3).

    Takes the 1286-d features and the centred points separately — the
    reference's concat(feat, points) (PoseNet9D.py:40) becomes a split first
    matmul (see _SplitDense) with identical parameters."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool,
                 sp_axis: str | None = None, xyz: jnp.ndarray | None = None):
        x = VecHead(6, dtype=self.dtype, name="vec")(feat, train, sp_axis,
                                                     xyz=xyz)
        return x[:, 0:3], x[:, 3:6]

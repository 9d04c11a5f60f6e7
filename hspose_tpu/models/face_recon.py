"""FaceRecon: hybrid-scope backbone stack + train-only recon/face heads.

Matches ``network/fs_net_repo/FaceRecon.py`` (:12-128): the 5-layer HS stack with two
4× pools (1028→257→64), BN+ReLU between HS layers, global max feature, 1-NN upsample
of the pooled maps, per-point fused feature
[fm_0 128 | fm_1 128 | fm_2 256 | fm_3 256 | fm_4 512 | one-hot 6] = 1286-d, and the
train-only conv1d/recon/face heads.

TPU-first differences (same math): channel-last layout, vertex-KNN computed once per
resolution and shared across the RF-P/ORL/pool consumers, PRNG-keyed pooling.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hspose_tpu.config import ModelConfig
from hspose_tpu.models.layers import HSLayer, HSLayerSurface, pool_layer, torch_linear_init
from hspose_tpu.ops.knn import (
    gather_neighbors,
    knn_indices as knn_indices_xla,
    knn_indices_fast,
    nearest_index,
)


def _bn(name: str, train: bool, dtype=None):
    # torch BatchNorm1d defaults: eps 1e-5, momentum 0.1 (flax momentum = 0.9)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        name=name, dtype=dtype)


class MLPHead(nn.Module):
    """Stack of Dense→BN→ReLU blocks with a final projection.

    ``final_act=True`` puts BN+ReLU on the output layer too (the reference's
    conv1d_block ends in BN+ReLU, FaceRecon.py:38-48; its recon/face heads end in a
    bare linear, :50-68).
    """

    hidden: tuple
    out: int
    final_act: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, kernel_init=torch_linear_init(x.shape[-1]),
                         bias_init=torch_linear_init(x.shape[-1]), name=f"dense_{i}")(x)
            x = _bn(f"bn_{i}", train)(x)
            x = jax.nn.relu(x)
        x = nn.Dense(self.out, kernel_init=torch_linear_init(x.shape[-1]),
                     bias_init=torch_linear_init(x.shape[-1]), name="dense_out")(x)
        if self.final_act:
            x = jax.nn.relu(_bn("bn_out", train)(x))
        return x


class FaceRecon(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, vertices: jnp.ndarray, cat_id: jnp.ndarray, train: bool,
                 with_heads: bool = False, sp_axis: Optional[str] = None):
        """vertices (B, N, 3) centred points; cat_id (B,) int 0-based.

        Returns (recon, face, feat): recon (B, N, 3) / face (B, N, 30) when
        ``train`` (or ``with_heads``) else None, and feat (B, N, 1286).

        ``with_heads`` runs the train-only recon/face heads in eval mode
        (deterministic, running BN stats, serving kernels) — the producer for
        the ``eval_recon`` reconstruction metrics (eval_utils_v1.py:672-707).
        Requires an unpruned (training) checkpoint.

        ``sp_axis``: sequence-parallel serving (must be called inside
        ``shard_map``).  ``vertices`` then holds this device's shard of the
        point axis; per layer, the source side (vertex/feature maps) is
        all-gathered over the mesh axis while queries, KNN index rows and all
        outputs stay local, and the cross-N reductions (ORL mean, global max)
        become collectives.  Returns the local shard of ``feat``.  The GLOBAL
        point count must divide by 16·sp so both pooled resolutions shard
        evenly — the large-N regime (SURVEY §5.7), not the 1028-point config.
        """
        cfg = self.cfg
        k = cfg.gcn_n_num
        # relaxed-KNN serving tier (inference only; mAP-gated — config.py)
        relax = not train
        if relax and cfg.serve_k > 0:
            k = cfg.serve_k
        rf_reuse = relax and cfg.serve_rf_reuse
        B, N, _ = vertices.shape
        # fast mode: bf16 features + one-pass distances + packed-key KNN selection
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        f32x2 = cfg.compute_dtype == "f32x2"  # 2-term-split serving tier
        fast = dtype == jnp.bfloat16

        if sp_axis is not None and (train or with_heads):
            raise NotImplementedError(
                "sequence parallelism is an inference path (train/with_heads "
                "shard over the batch axis instead)")

        def ag(x):
            """All-gather the point axis (identity without sp)."""
            if sp_axis is None:
                return x
            return jax.lax.all_gather(x, sp_axis, axis=1, tiled=True)

        if cfg.knn_impl == "xla":
            def knn_indices(p, kk, src=None):
                return knn_indices_xla(p, kk, source=src)
        elif cfg.knn_impl == "pallas":
            from hspose_tpu.ops.pallas_knn import (
                knn_indices_pallas,
                knn_indices_pallas_qs,
            )

            def knn_indices(p, kk, src=None):
                if src is not None:
                    return knn_indices_pallas_qs(p, src, kk, fast=fast)
                return knn_indices_pallas(p, kk, fast=fast)
        else:  # auto: fused Pallas kernel on TPU, XLA elsewhere
            def knn_indices(p, kk, src=None):
                return knn_indices_fast(p, kk, fast=fast, source=src)

        one_hot = jax.nn.one_hot(cat_id.astype(jnp.int32).reshape(B), cfg.obj_c,
                                 dtype=dtype)

        # --- resolution 0: N points -------------------------------------------------
        verts_g = ag(vertices) if sp_axis is not None else None
        sp = 1 if sp_axis is None else verts_g.shape[1] // N
        vert_idx_0 = knn_indices(vertices, k, verts_g)  # conv_0 RF-P, conv_0/1 ORL
        fm_0 = HSLayerSurface(128, cfg.gcn_sup_num, dtype=dtype,
                              bwd_exact=cfg.bwd_exact, infer_v3=cfg.infer_v3, f32x2=f32x2, name="conv_0")(
            vertices, rf_idx=vert_idx_0, orl_idx=vert_idx_0, train=train,
            sp_axis=sp_axis, verts_src=verts_g)
        fm_0 = jax.nn.relu(fm_0)

        fm_0_g = ag(fm_0) if sp_axis is not None else None
        # RF-F on features (gcn3d.py:150-153); relaxed tier reuses the xyz KNN
        rf_1 = vert_idx_0 if rf_reuse else knn_indices(fm_0, k, fm_0_g)
        fm_1 = HSLayer(128, 128, cfg.gcn_sup_num, dtype=dtype,
                     bwd_exact=cfg.bwd_exact, bwd_store=cfg.bwd_store,
                     train_v4_small=cfg.train_v4_small,
                     infer_v3=cfg.infer_v3, f32x2=f32x2, name="conv_1")(
            vertices, fm_0, rf_idx=rf_1, orl_idx=vert_idx_0, train=train,
            sp_axis=sp_axis, verts_src=verts_g, feat_src=fm_0_g)
        fm_1 = jax.nn.relu(_bn("bn1", train, dtype)(fm_1))

        pool_idx_0 = knn_indices(vertices, 4, verts_g)
        key1 = self.make_rng("pool")
        v_pool_1, fm_pool_1 = pool_layer(
            key1, vertices, fm_1, pool_idx_0, sp_axis=sp_axis,
            verts_src=verts_g,
            feat_src=ag(fm_1) if sp_axis is not None else None)

        # --- resolution 1: N//4 points ----------------------------------------------
        n1 = v_pool_1.shape[1] * sp  # GLOBAL pooled size sets the k rule
        k1 = min(k, n1 // 8)  # FaceRecon.py:92-95
        vp1_g = ag(v_pool_1) if sp_axis is not None else None
        fmp1_g = ag(fm_pool_1) if sp_axis is not None else None
        vert_idx_1 = knn_indices(v_pool_1, k1, vp1_g)
        rf_2 = knn_indices(fm_pool_1, k1, fmp1_g)
        fm_2 = HSLayer(128, 256, cfg.gcn_sup_num, dtype=dtype,
                     bwd_exact=cfg.bwd_exact, bwd_store=cfg.bwd_store,
                     train_v4_small=cfg.train_v4_small,
                     infer_v3=cfg.infer_v3, f32x2=f32x2, name="conv_2")(
            v_pool_1, fm_pool_1, rf_idx=rf_2, orl_idx=vert_idx_1, train=train,
            sp_axis=sp_axis, verts_src=vp1_g, feat_src=fmp1_g)
        fm_2 = jax.nn.relu(_bn("bn2", train, dtype)(fm_2))

        fm_2_g = ag(fm_2) if sp_axis is not None else None
        # relaxed tier: conv_3 reuses conv_2's feature-space neighbourhoods
        rf_3 = rf_2 if rf_reuse else knn_indices(fm_2, k1, fm_2_g)
        fm_3 = HSLayer(256, 256, cfg.gcn_sup_num, dtype=dtype,
                     bwd_exact=cfg.bwd_exact, bwd_store=cfg.bwd_store,
                     train_v4_small=cfg.train_v4_small,
                     infer_v3=cfg.infer_v3, f32x2=f32x2, name="conv_3")(
            v_pool_1, fm_2, rf_idx=rf_3, orl_idx=vert_idx_1, train=train,
            sp_axis=sp_axis, verts_src=vp1_g, feat_src=fm_2_g)
        fm_3 = jax.nn.relu(_bn("bn3", train, dtype)(fm_3))

        pool_idx_1 = knn_indices(v_pool_1, 4, vp1_g)
        key2 = self.make_rng("pool")
        v_pool_2, fm_pool_2 = pool_layer(
            key2, v_pool_1, fm_3, pool_idx_1, sp_axis=sp_axis,
            verts_src=vp1_g,
            feat_src=ag(fm_3) if sp_axis is not None else None)

        # --- resolution 2: N//16 points ---------------------------------------------
        n2 = v_pool_2.shape[1] * sp
        k2 = min(k, n2 // 8)  # FaceRecon.py:97
        vp2_g = ag(v_pool_2) if sp_axis is not None else None
        fmp2_g = ag(fm_pool_2) if sp_axis is not None else None
        vert_idx_2 = knn_indices(v_pool_2, k2, vp2_g)
        rf_4 = knn_indices(fm_pool_2, k2, fmp2_g)
        fm_4 = HSLayer(256, 512, cfg.gcn_sup_num, dtype=dtype,
                     bwd_exact=cfg.bwd_exact, bwd_store=cfg.bwd_store,
                     train_v4_small=cfg.train_v4_small,
                     infer_v3=cfg.infer_v3, f32x2=f32x2, name="conv_4")(
            v_pool_2, fm_pool_2, rf_idx=rf_4, orl_idx=vert_idx_2, train=train,
            sp_axis=sp_axis, verts_src=vp2_g, feat_src=fmp2_g)

        f_global = jnp.max(fm_4, axis=1)  # (B, 512)
        if sp_axis is not None:
            f_global = jax.lax.pmax(f_global, sp_axis)

        # 1-NN upsample back to N points (FaceRecon.py:100-104)
        up_1 = nearest_index(vertices, vp1_g if sp_axis is not None else v_pool_1)
        up_2 = nearest_index(vertices, vp2_g if sp_axis is not None else v_pool_2)
        fm_2_up = gather_neighbors(fm_2_g if sp_axis is not None else fm_2,
                                   up_1[..., None])[:, :, 0]
        fm_3_up = gather_neighbors(ag(fm_3) if sp_axis is not None else fm_3,
                                   up_1[..., None])[:, :, 0]
        fm_4_up = gather_neighbors(ag(fm_4) if sp_axis is not None else fm_4,
                                   up_2[..., None])[:, :, 0]

        one_hot_tiled = jnp.broadcast_to(one_hot[:, None, :], (B, N, cfg.obj_c))
        feat = jnp.concatenate([fm_0, fm_1, fm_2_up, fm_3_up, fm_4_up, one_hot_tiled],
                               axis=-1)  # (B, N, 1286)

        if not (train or with_heads):
            return None, None, feat

        # train-only heads (FaceRecon.py:37-68, 114-125)
        conv1d_out = MLPHead((512, 512), 256, final_act=True, name="conv1d_block")(feat, train)
        recon = MLPHead((128,), 3, name="recon_head")(conv1d_out, train)

        f_global_tiled = jnp.broadcast_to(f_global[:, None, :], (B, N, f_global.shape[-1]))
        face_in = jnp.concatenate([f_global_tiled, conv1d_out, vertices], axis=-1)  # 771
        face = MLPHead((512, 256, 128), cfg.face_recon_c, name="face_head")(face_in, train)
        return recon, face, feat

"""Typed configuration for hspose_tpu.

The reference drives everything through ~70 mutable absl flags defined in
``config/config.py:6-125`` and mutated at runtime (e.g. ``FLAGS.train = False`` in
``evaluation/evaluate.py:39``).  The TPU-native rebuild replaces that with one frozen
dataclass tree: values are threaded explicitly, train/eval is a call-time argument
(never a global), and configs are hashable so they can be closed over by ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Dataset paths and input pipeline (reference config/config.py:6-28,43-44)."""

    num_categories: int = 6
    dataset: str = "Real"  # 'CAMERA', 'Real', or 'CAMERA+Real'
    dataset_dir: str = "./data/NOCS"
    detection_dir: str = "./data/segmentation_results"
    per_obj: str = ""

    # dynamic zoom-in crop augmentation (reference config/config.py:13-16)
    dzi_pad_scale: float = 1.5
    dzi_type: str = "uniform"
    dzi_scale_ratio: float = 0.25
    dzi_shift_ratio: float = 0.25

    img_size: int = 256  # cropped square ROI resolution

    # 2D mask noise (reference config/config.py:22-23)
    roi_mask_r: int = 3
    roi_mask_pro: float = 0.5

    # point selection (reference config/config.py:43-44)
    num_points: int = 1028
    sample_method: str = "basic"
    # 'host': back-project + sample per crop in the loader workers (reference
    # semantics, load_data.py:307-333); 'device': ship the 256² depth/mask/coord
    # crops and fuse back-projection + fixed-size sampling into the jitted train
    # step (the north-star "fused preprocessing" — host keeps only PNG decode +
    # warps).  Shares the kernel with eval.sample_mode=device.
    sample_mode: str = "host"

    # host pipeline.  -1 (default) auto-sizes the loader worker-process pool
    # from the host's CPU count (data/dataset.py::resolve_num_workers — the
    # reference hardcodes num_workers=20, engine/train.py:65-69); an explicit
    # value is honored as-is.  The train loop warns when the pool's projected
    # throughput (measured ~121 samples/s/core, docs/PERFORMANCE.md) is below
    # the measured TPU step rate — i.e. when the host would starve the chip.
    num_workers: int = -1
    prefetch: int = 4
    # fused C++ decode+crop+backprojection (native/preproc.cpp): bit-exact vs
    # the cv2/numpy path (tests/test_native_preproc.py), 1.8x faster per train
    # sample / 4x per eval image single-threaded; falls back automatically
    # when the library can't build/load or a file needs cv2's wider formats
    native_preproc: bool = True


@dataclass(frozen=True)
class AugConfig:
    """Batched on-device augmentation probabilities (reference config/config.py:24-28)."""

    pc_pro: float = 0.2
    pc_r: float = 0.2
    rt_pro: float = 0.3
    bb_pro: float = 0.3
    bc_pro: float = 0.3  # box-cage, only bowl & mug


@dataclass(frozen=True)
class ModelConfig:
    """Network dimensions (reference config/config.py:31-41)."""

    feat_c_rot: int = 1286
    rot_c: int = 4  # confidence (1) + axis (3)
    feat_c_ts: int = 1289
    ts_c: int = 6  # translation (3) + size (3)
    feat_face: int = 768
    face_recon_c: int = 30  # 6*3 normals + 6 distances + 6 confidences
    gcn_sup_num: int = 7
    gcn_n_num: int = 20
    obj_c: int = 6
    # TPU-specific knobs (no reference equivalent)
    knn_impl: str = "auto"  # 'auto' (pallas on TPU) | 'xla' | 'pallas'
    # backbone matmul precision tier: 'float32' (f32-faithful serving /
    # training default), 'bfloat16' (fast serving, ~4e-3), or 'f32x2'
    # (serving middle tier: 2-term-split feature gathers in the v4 kernels,
    # ~1.5e-5 — one MXU pass cheaper per gather than float32's 3-term split)
    compute_dtype: str = "float32"
    # backward-kernel precision: False (default) runs the HS-kernel backward at
    # one bf16 MXU pass per matmul (~13 ms/step faster; bf16-grade gradient
    # noise, sanity-verified); True keeps bf16x3 f32-faithful gradients
    bwd_exact: bool = False
    # support-kernel backward variant (round-5 probe (c), the adopted
    # default): the forward stores the winner's theta/proj values (2 extra
    # (B, N, S·Co) f32 residuals) and the backward skips both recomputes —
    # one fewer big MXU pass per support.  Measured at the bf16 batch-24
    # optimum: 50.7 -> 48.8 ms/step (-3.8%), loss bit-identical to the
    # recompute backward (same winner, same values — the forward computed
    # them).  False restores the recompute backward (no residual HBM).
    bwd_store: bool = True
    # round-5 probe (d): route the POOLED-resolution layers (N<=512: conv_2/3
    # at N//4, conv_4 at N//16, incl. their ORL branches) through the fused v4
    # kernels during TRAINING — the in-kernel one-hot gather costs O(N·C) MXU
    # work per gathered element, 4-16x smaller at the pooled sizes than at
    # N=1028 where it loses (docs/PERFORMANCE.md "v4 kernels at train batch").
    # Gradients flow through the v4 custom VJPs (grad-checked vs XLA).
    train_v4_small: bool = False
    # debugging knob: route f32 TPU *inference* through the v3 pre-gathered
    # kernels (0-ULP HIGHEST gathers) instead of the default v4 fused kernels,
    # restoring bitwise reproducibility against pre-round-3 f32 eval outputs.
    # ~1-ulp-grade difference only; mAP-level results are identical.
    infer_v3: bool = False
    # --- relaxed-KNN serving tier (round-5 probe, INFERENCE ONLY; training
    # always uses the reference semantics).  Both knobs change which
    # neighbours the backbone sees, so they are semantic relaxations gated by
    # the 1024-crop mAP tier study (scripts/fast_mode_parity.py, 0.3-pt
    # budget) — see docs/PERFORMANCE.md for the measured throughput/mAP trade.
    # serve_k overrides the neighbour count k (0 = reference gcn_n_num=20);
    # the pooled-resolution rules min(k, n//8) still apply.
    serve_k: int = 0
    # serve_rf_reuse reuses already-computed KNN index sets for the RF-F
    # layers: conv_1 takes the xyz KNN (vert_idx_0) instead of its
    # feature-space search, conv_3 takes conv_2's feature KNN — dropping two
    # of the six serving KNN searches (ref: gcn3d.py:195-203 RF-F).
    serve_rf_reuse: bool = False


@dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference config/config.py:64-93)."""

    fsnet_loss_type: str = "l1"  # 'l1' or 'smoothl1'

    rot_1_w: float = 8.0
    rot_2_w: float = 8.0
    rot_regular: float = 4.0
    tran_w: float = 8.0
    size_w: float = 8.0
    recon_w: float = 8.0
    r_con_w: float = 1.0

    recon_n_w: float = 3.0
    recon_d_w: float = 3.0
    recon_v_w: float = 1.0
    recon_s_w: float = 0.3
    recon_f_w: float = 1.0
    recon_bb_r_w: float = 1.0
    recon_bb_t_w: float = 1.0
    recon_bb_s_w: float = 1.0
    recon_bb_self_w: float = 1.0

    mask_w: float = 1.0

    geo_p_w: float = 1.0
    geo_s_w: float = 10.0
    geo_f_w: float = 0.1

    prop_pm_w: float = 2.0
    prop_sym_w: float = 1.0
    prop_r_reg_w: float = 1.0


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer + schedule (reference config/config.py:96-110)."""

    lr: float = 1e-4
    lr_pose: float = 1.0
    lr_scheduler_name: str = "flat_and_anneal"
    anneal_method: str = "cosine"
    anneal_point: float = 0.72
    optimizer_type: str = "Ranger"
    weight_decay: float = 0.0
    warmup_factor: float = 0.001
    warmup_iters: int = 1000
    warmup_method: str = "linear"
    gamma: float = 0.1
    poly_power: float = 0.9
    # relative milestone positions for WarmupMultiStepLR
    # (reference tools/solver_utils.py:60, REL_STEPS defaults)
    rel_steps: Tuple[float, float] = (2.0 / 3.0, 8.0 / 9.0)
    # Ranger internals (reference tools/torch_utils/solver/ranger2020.py:45-60)
    betas: Tuple[float, float] = (0.95, 0.999)
    eps: float = 1e-5
    n_sma_threshold: int = 5
    lookahead_k: int = 6
    lookahead_alpha: float = 0.5
    use_gc: bool = True
    clip_grad_norm: float = 5.0


@dataclass(frozen=True)
class TrainConfig:
    """Training loop (reference config/config.py:47-59,113-120)."""

    train_stage: str = "PoseNet_only"
    seed: int = -1
    batch_size: int = 16
    total_epoch: int = 150
    train_steps: int = 1500
    accumulate: int = 1
    save_every: int = 10
    log_every: int = 100
    model_save: str = "output/models"
    resume: bool = False
    resume_model: str = ""
    resume_point: int = 0
    # sanitizer mode — analog of the reference's always-on
    # torch.autograd.set_detect_anomaly(True) (engine/train.py:22): enables
    # jax_debug_nans (the step re-runs op-by-op and raises at the first NaN
    # producer) and per-loss-family finite-check metrics.  Opt-in: the eager
    # re-check costs ~2× on a faulting step and the extra metrics cost a little
    # every step.
    debug_nan: bool = False


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation (reference config/config.py:123-125)."""

    eval_seed: int = -1
    eval_inference_only: bool = False
    # TPU rebuild: batch detection crops across images (reference runs per-image,
    # evaluation/evaluate.py:79-119); this is the padded-crop batch size.
    # 24 is the measured single-chip serving optimum — throughput falls ~5%
    # by B=256 (scripts/probe_serve_batch.py; fast tier is flat over 16..32,
    # the exact/f32x2 tiers gain ~1.5-2% at 24); multi-chip serving wants
    # eval_batch = 24 * dp.
    eval_batch: int = 24
    # maximum detections padded per image in the batched harness
    max_instances_per_image: int = 16
    # 'host': back-project + sample per crop on the host (reference semantics,
    # load_data_eval.py:253-254); 'device': ship the 256² crops and run the
    # fused jitted backprojection+sampling on-chip (frees host cores for PNG
    # decode + warps)
    sample_mode: str = "host"
    # produce per-detection reconstruction metrics (chamfer_dis_cass /
    # emd_dis_cass, the eval_recon interface of eval_utils_v1.py:672-707):
    # runs the recon head in eval mode and measures chamfer + Sinkhorn-EMD
    # between the reconstructed cloud and the observed points.  Requires an
    # unpruned (training) checkpoint — the recon head must be present.
    recon: bool = False
    # Sinkhorn-EMD operating point for the recon metrics.  Measured against
    # the exact assignment EMD (scipy linear_sum_assignment) at production
    # shapes (N=1028 box-surface clouds, scripts/probe_emd_bias.py): bias is
    # set by epsilon, not iters — (0.02, 50) overshoots +30%/+10%/+6% in the
    # near/mid/far regimes while (0.005, 200) sits at +3.0%/+1.1%/+0.0%, and
    # 500 iters changes nothing past 200.  Tightened defaults accordingly.
    emd_epsilon: float = 0.005
    emd_iters: int = 200


@dataclass(frozen=True)
class ParallelConfig:
    """Device mesh layout.  The reference is single-GPU (engine/train.py:23); the TPU
    framework adds data parallelism over a jax.sharding.Mesh as its first-class
    distributed feature (SURVEY.md §2.2)."""

    dp: int = -1  # -1: use all available devices on the data axis
    mesh_axis_name: str = "dp"
    # model (tensor) parallelism: mp > 1 lays the devices out as a 2-D
    # (dp, mp) mesh and shards every eligible Dense kernel's OUTPUT channels
    # over the mp axis (parallel/mesh.py::state_sharding) — XLA inserts the
    # all-gathers/reduces over ICI.  mp=1 keeps the pure-DP 1-D mesh.
    mp: int = 1
    model_axis_name: str = "mp"
    # sequence (point-axis) parallelism for SERVING at large N: sp > 1 lays a
    # 2-D (dp, sp) mesh, shards each crop's point axis over sp and runs local
    # queries against all-gathered sources with collective cross-N reductions
    # (parallel/sp.py).  Requires num_points % (16*sp) == 0 (the large-N
    # configs); mutually exclusive with mp; eval-only.
    sp: int = 1


@dataclass(frozen=True)
class HSPoseConfig:
    data: DataConfig = field(default_factory=DataConfig)
    aug: AugConfig = field(default_factory=AugConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "HSPoseConfig":
        return dataclasses.replace(self, **kw)


def default_config() -> HSPoseConfig:
    return HSPoseConfig()


def _apply_dotted(cfg: HSPoseConfig, dotted: str, value: str) -> HSPoseConfig:
    """Apply one 'section.key=value' override with type coercion."""
    section_name, _, key = dotted.partition(".")
    if not key:
        raise ValueError(f"override '{dotted}' must look like section.key")
    section = getattr(cfg, section_name)
    old = getattr(section, key)
    if isinstance(old, bool):
        new = value.lower() in ("1", "true", "yes")
    elif isinstance(old, int):
        new = int(value)
    elif isinstance(old, float):
        new = float(value)
    elif isinstance(old, tuple):
        new = tuple(type(old[0])(v) for v in value.split(","))
    else:
        new = value
    return dataclasses.replace(cfg, **{section_name: dataclasses.replace(section, **{key: new})})


def format_help(cfg: Optional[HSPoseConfig] = None) -> str:
    """Flag listing in the spirit of the reference's ``--help`` (absl flags,
    config/config.py:6-125): every section.key with its type and default."""
    cfg = cfg or default_config()
    lines = ["Overrides take the form section.key=value (a leading -- is allowed).",
             ""]
    for f in dataclasses.fields(cfg):
        section = getattr(cfg, f.name)
        lines.append(f"[{f.name}]")
        for sf in dataclasses.fields(section):
            default = getattr(section, sf.name)
            lines.append(f"  {f.name}.{sf.name}={default!r}  ({type(default).__name__})")
        lines.append("")
    return "\n".join(lines)


def parse_overrides(argv, cfg: Optional[HSPoseConfig] = None) -> HSPoseConfig:
    """Parse CLI args of the form ``section.key=value`` (also accepts ``--section.key=value``).

    ``--help``/``-h`` prints the full flag listing and exits, like the
    reference's absl CLI.
    """
    # honour HSPOSE_PLATFORM before any backend initializes (the axon TPU
    # plugin pins jax_platforms and ignores the standard JAX_PLATFORMS env
    # var): lets scripts and subprocess tests force e.g. cpu for CLI runs
    platform = os.environ.get("HSPOSE_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    cfg = cfg or default_config()
    for arg in argv:
        arg = arg.lstrip("-")
        if arg in ("help", "h"):
            print(format_help(cfg))
            raise SystemExit(0)
        if "=" not in arg:
            raise ValueError(f"unrecognized argument '{arg}' (expected section.key=value)")
        dotted, _, value = arg.partition("=")
        cfg = _apply_dotted(cfg, dotted, value)
    return cfg

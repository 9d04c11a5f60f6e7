from hspose_tpu.models.face_recon import FaceRecon
from hspose_tpu.models.heads import PoseTsHead, RotationHead
from hspose_tpu.models.hspose import (
    build_model,
    compute_losses,
    eval_forward,
    total_loss,
    train_forward,
)
from hspose_tpu.models.layers import HSLayer, HSLayerSurface, pool_layer
from hspose_tpu.models.posenet import PoseNet9D, PoseNetOutput

__all__ = [
    "FaceRecon", "PoseTsHead", "RotationHead", "build_model", "compute_losses",
    "eval_forward", "total_loss", "train_forward", "HSLayer", "HSLayerSurface",
    "pool_layer", "PoseNet9D", "PoseNetOutput",
]

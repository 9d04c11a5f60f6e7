from hspose_tpu.evaluation.metrics import (
    compute_ap_from_matches_scores,
    compute_degree_cm_mAP,
    greedy_iou_matches,
    greedy_pose_matches,
)
from hspose_tpu.evaluation.metrics_legacy import compute_mAP

__all__ = [
    "compute_ap_from_matches_scores", "compute_degree_cm_mAP", "compute_mAP",
    "greedy_iou_matches", "greedy_pose_matches",
]

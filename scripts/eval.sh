#!/usr/bin/env bash
# Canonical evaluation command (reference script.sh:2 with its published eval seed).
set -euo pipefail
python -m hspose_tpu.evaluation.evaluate \
    data.dataset_dir="${NOCS_DIR:-./data/NOCS}" \
    data.detection_dir="${DETECTION_DIR:-./data/segmentation_results}" \
    train.resume_model="${CKPT:?set CKPT to an orbax dir or reference .pth}" \
    eval.eval_seed=1677483078 "$@"

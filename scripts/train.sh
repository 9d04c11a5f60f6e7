#!/usr/bin/env bash
# Canonical training command (reference script.sh:1 with its published seed).
set -euo pipefail
python -m hspose_tpu.engine.train \
    data.dataset_dir="${NOCS_DIR:-./data/NOCS}" \
    train.batch_size=16 train.train_steps=1500 train.seed=1677330429 "$@"

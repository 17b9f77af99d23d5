#!/usr/bin/env bash
# Build KITTI info pkls + the gt-sampling database
# (parity: tools/scripts/kitti/preprocess_kitti.sh — SLURM directives
# dropped; run directly or under your scheduler).
set -e
DATA=${1:-../data/kitti}
python -m crb_active_3ddet_tpu.datasets.kitti.kitti_dataset \
    create_kitti_infos tools/cfgs/dataset_configs/kitti_dataset.yaml "$DATA"

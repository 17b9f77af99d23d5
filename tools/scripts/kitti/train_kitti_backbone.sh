#!/usr/bin/env bash
# Pretrain the shared backbone checkpoints used by all strategies
# (parity: tools/scripts/kitti/train_kitti_backbone.sh).
set -e
CFG=${1:-tools/cfgs/active-kitti_models/pv_rcnn_active_random.yaml}
python tools/train.py --cfg_file "$CFG" --extra_tag backbone

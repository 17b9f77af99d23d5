#!/usr/bin/env bash
# Pretrain the shared waymo backbone used by every AL strategy
# (parity: tools/scripts/waymo/train_waymo_backbone.sh).
set -e
CFG=${1:-tools/cfgs/active-waymo_models/pv_rcnn_active_random.yaml}
python tools/train.py --cfg_file "$CFG" --workers 3 --batch_size 6 \
    --extra_tag backbone --max_ckpt_save_num 200

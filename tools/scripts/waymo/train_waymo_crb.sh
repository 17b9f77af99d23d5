#!/usr/bin/env bash
# CRB active-learning rounds on waymo from the pretrained backbone
# (parity: tools/scripts/waymo/train_waymo_crb.sh), then eval + visualize.
set -e
CFG=${1:-tools/cfgs/active-waymo_models/pv_rcnn_active_crb.yaml}
TAG=${2:-crb}
python tools/train.py --cfg_file "$CFG" --workers 3 --batch_size 6 \
    --extra_tag "$TAG" --max_ckpt_save_num 200
python tools/test.py --cfg_file "$CFG" --extra_tag "$TAG" --eval_all
python tools/visualize.py --cfg_file "$CFG" --extra_tag "$TAG"

#!/usr/bin/env bash
# TPU equivalent of the reference's SLURM chain
# (tools/scripts/kitti/train_kitti_crb.sh: train -> test --eval_all ->
# visualize). Single-host; multi-host runs prepend jax.distributed env.
set -e
CFG=${1:-tools/cfgs/active-kitti_models/pv_rcnn_active_crb.yaml}
TAG=${2:-crb_run}
python tools/train.py --cfg_file "$CFG" --extra_tag "$TAG"
python tools/test.py --cfg_file "$CFG" --extra_tag "$TAG" --eval_all --max_waiting_mins 1

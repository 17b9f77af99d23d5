#!/usr/bin/env bash
# tfrecords → per-frame npy + info pkls + gt database
# (parity: tools/scripts/waymo/preprocess_waymo.sh; requires the
# waymo-open-dataset pip package for the tfrecord reader).
set -e
python -m crb_active_3ddet_tpu.datasets.waymo.waymo_dataset \
    --func create_waymo_infos \
    --cfg_file tools/cfgs/dataset_configs/waymo_dataset.yaml

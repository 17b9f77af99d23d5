#!/usr/bin/env bash
# Fetch the Waymo Open Dataset v1.2 tars with gsutil
# (parity: tools/scripts/waymo/download_waymo.sh, cluster directives dropped).
set -e
DEST=${1:-../data/waymo/raw_data}
mkdir -p "$DEST"
gsutil -m cp -r \
  "gs://waymo_open_dataset_v_1_2_0/testing" \
  "gs://waymo_open_dataset_v_1_2_0/training" \
  "gs://waymo_open_dataset_v_1_2_0/validation" \
  "$DEST/"

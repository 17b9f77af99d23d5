#!/usr/bin/env bash
# Unpack downloaded Waymo tars into per-split tfrecord dirs
# (parity: tools/scripts/waymo/unzip_waymo.sh).
set -e
RAW=${1:-../data/waymo/raw_data}
for split in training validation testing; do
  for f in "$RAW/$split"/*.tar; do
    [ -e "$f" ] || continue
    tar -xf "$f" -C "$RAW/$split" && rm -f "$f"
  done
done

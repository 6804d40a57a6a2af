#!/usr/bin/env bash
# Fetch the TUM RGB-D sequences used by configs/{mono,rgbd}/tum into
# datasets/tum (same layout the reference expects; dataset.py TUMParser).
set -euo pipefail
mkdir -p datasets/tum && cd datasets/tum
for seq in \
  freiburg1/rgbd_dataset_freiburg1_desk \
  freiburg2/rgbd_dataset_freiburg2_xyz \
  freiburg3/rgbd_dataset_freiburg3_long_office_household; do
  wget -c "https://vision.in.tum.de/rgbd/dataset/${seq}.tgz"
  tar -xzf "$(basename "$seq").tgz"
done

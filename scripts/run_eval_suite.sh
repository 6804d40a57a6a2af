#!/usr/bin/env bash
# Run the evaluation suite over the BASELINE configs (datasets must be
# downloaded first; see download_*.sh). Results land under results/.
set -euo pipefail
for cfg in \
  configs/mono/tum/fr3_office.yaml \
  configs/rgbd/tum/fr3_office.yaml \
  configs/rgbd/replica/office0.yaml \
  configs/rgbd/replica/office0_sp.yaml \
  configs/stereo/euroc/mh02.yaml; do
  echo "=== $cfg ==="
  python slam.py --config "$cfg" --eval
done

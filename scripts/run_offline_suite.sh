#!/usr/bin/env bash
# Offline (no-download) evaluation suite: every config that can run inside
# this container — the committed TUM-format fixture (real TUM parser:
# timestamp association, 16-bit depth, quaternion GT) plus the synthetic
# surface-scene regressions. Stands in for scripts/run_eval_suite.sh until
# the real TUM/Replica/EuRoC datasets are reachable.
#
# CPU by default (the axon TPU relay admits one process at a time and the
# sitecustomize hook wedges interpreters when the relay is down); pass
# --tpu to use the ambient accelerator.
set -euo pipefail
cd "$(dirname "$0")/.."

ENVPREFIX=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
if [[ "${1:-}" == "--tpu" ]]; then
  ENVPREFIX=(env)
  shift
fi

for cfg in \
  configs/rgbd/tum/fixture_surface.yaml \
  configs/synthetic/surface_160.yaml \
  configs/synthetic/tiny_rgbd.yaml \
  configs/synthetic/tiny_mono.yaml; do
  echo "=== $cfg ==="
  "${ENVPREFIX[@]}" python slam.py --config "$cfg" --eval
done

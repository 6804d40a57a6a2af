#!/usr/bin/env bash
# Fetch EuRoC MH_02_easy into datasets/euroc/mh02 for configs/stereo/euroc.
set -euo pipefail
mkdir -p datasets/euroc && cd datasets/euroc
wget -c http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/machine_hall/MH_02_easy/MH_02_easy.zip
unzip -q MH_02_easy.zip -d mh02 && rm -f MH_02_easy.zip

#!/usr/bin/env bash
# Fetch the Replica renders (NICE-SLAM packaging) into datasets/replica
# for configs/rgbd/replica.
set -euo pipefail
mkdir -p datasets && cd datasets
wget -c https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip -q Replica.zip && mv Replica replica && rm -f Replica.zip

#!/bin/bash
# Precomputed run outputs published by the reference authors (meshes +
# trajectories for the visualizer). Usage: ./download_precomputed_vis.sh
set -e
mkdir -p vis && cd vis
for z in replica_3 7scenes_4 azure_2 azure_3; do
    wget "https://cvg-data.inf.ethz.ch/nicer-slam/vis/${z}.zip" && unzip "${z}.zip" && rm -f "${z}.zip"
done

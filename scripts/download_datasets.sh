#!/bin/bash
# Fetch the public datasets the reference evaluates on (same sources as the
# reference's scripts/download_*.sh). Usage: ./download_datasets.sh [replica|demo|azure|7scenes|replica_eval|all]
set -e
what="${1:-all}"
mkdir -p Datasets/orig
cd Datasets/orig

fetch_zip() {  # url
    wget "$1" && unzip "$(basename "$1")" && rm -f "$(basename "$1")"
}

if [ "$what" = replica ] || [ "$what" = all ]; then
    fetch_zip https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
fi
if [ "$what" = demo ] || [ "$what" = all ]; then
    fetch_zip https://cvg-data.inf.ethz.ch/nicer-slam/data/Demo.zip
fi
if [ "$what" = azure ] || [ "$what" = all ]; then
    fetch_zip https://cvg-data.inf.ethz.ch/nicer-slam/data/Azure.zip
fi
if [ "$what" = replica_eval ] || [ "$what" = all ]; then
    fetch_zip https://cvg-data.inf.ethz.ch/nicer-slam/data/Replica_eval_ext.zip
fi
if [ "$what" = 7scenes ] || [ "$what" = all ]; then
    base_dir=7Scenes
    mkdir -p "$base_dir" && cd "$base_dir"
    base_url="http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8"
    for ds in chess fire heads office pumpkin redkitchen stairs tsdf; do
        wget "${base_url}/${ds}.zip" && unzip "${ds}.zip" && rm -f "${ds}.zip"
        if [ -f "${ds}/seq-01.zip" ]; then (cd "${ds}" && unzip seq-01.zip && rm -f seq-01.zip); fi
    done
    cd ..
fi

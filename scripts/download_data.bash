#!/usr/bin/env bash
# Dataset + checkpoint download (same sources as the reference's
# data/download_data.bash; requires gdown + network access).
set -euo pipefail

cd "$(dirname "$0")/../data"

# ShapeNetCore.v2.PC15k
gdown 'https://drive.google.com/uc?id=1myIBzh8_Ja5gXoz6MiSAaZWXe4BQ68yB'
# Scan2CAD_pc
gdown 'https://drive.google.com/uc?id=13My4wm3hi4pe-DxLcjuIpvA__U4PM1fq'
# Scan2CAD_annotations
gdown 'https://drive.google.com/uc?id=1zPajN8FyOJtdLNdam_Dtw9SHmq5GaVs9'

for f in *.zip; do unzip -n "$f"; done

#!/usr/bin/env bash
# ShapeNet table registration demo (parity: docker/entrypoint_table.bash).
set -euo pipefail
cd /opt/corsair_tpu
python -m corsair_tpu.cli.evaluation_shapenet \
    --shapenet-root data/ShapeNetCore.v2.PC15k \
    --category table --n-models 100 --n-poses-per-model 1 \
    --model-ckpt ckpts/scannet_pose_table_best --random-seed 0
python -m corsair_tpu.cli.compute_metrics_shapenet --categories table

#!/usr/bin/env bash
# ShapeNet chair registration demo (parity: docker/entrypoint_chair.bash).
set -euo pipefail
cd /opt/corsair_tpu
python -m corsair_tpu.cli.evaluation_shapenet \
    --shapenet-root data/ShapeNetCore.v2.PC15k \
    --category chair --n-models 100 --n-poses-per-model 1 \
    --model-ckpt ckpts/scannet_ret_chair --random-seed 0
python -m corsair_tpu.cli.compute_metrics_shapenet --categories chair

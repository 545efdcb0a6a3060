#!/usr/bin/env bash
# Scan2CAD splat-reconstruction retrieval demo
# (parity: docker/entrypoint_shape.bash).
set -euo pipefail
cd /opt/corsair_tpu
python -m corsair_tpu.cli.evaluation_scan2cad \
    --shapenet-pc15k-root data/ShapeNetCore.v2.PC15k \
    --scan2cad-pc-root data/Scan2CAD_pc \
    --scan2cad-annotation-root data/Scan2CAD_annotations \
    --shapenet-radegs-root data/RaDe-GS \
    --category chair --checkpoint ckpts/scannet_ret_chair

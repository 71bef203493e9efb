#!/usr/bin/env bash
# Lafida indoor/outdoor run (Scripts/runCubemapLafida.sh analog).
# Usage: run_lafida.sh DATASET_DIR [OUT_DIR]
set -euo pipefail
DATA=${1:?dataset dir}
OUT=${2:-out/lafida}
mkdir -p "$OUT"
# CONFIG: path to a reference-format calibration YAML; "none" uses the
# built-in defaults, which ARE the Lafida cam0 calibration
python -m cubemapslam_tpu.apps.run_lafida \
    "${VOC:-none}" \
    "${CONFIG:-none}" \
    "$DATA/images" \
    "$DATA/image_list.txt" \
    "${MASK:-none}" \
    "$OUT/keyframe_trajectory.txt" \
    "$OUT/perf.txt"

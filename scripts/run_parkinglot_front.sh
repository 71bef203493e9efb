#!/usr/bin/env bash
# parkinglot_front vehicle run (Scripts/runCubemapParkinglotFront.sh analog).
set -euo pipefail
DATA=${1:?dataset dir}
OUT=${2:-out/parkinglot_front}
mkdir -p "$OUT"
python -m cubemapslam_tpu.apps.run_fangshan \
    none \
    "${CONFIG:-Config/front_cam_params.yaml}" \
    "$DATA/images" \
    "$DATA/image_list.txt" \
    "${MASK:-none}" \
    "$OUT/keyframe_trajectory.txt" \
    "$OUT/perf.txt"

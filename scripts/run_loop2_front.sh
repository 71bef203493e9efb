#!/usr/bin/env bash
# loop2_front loop-closure run (Scripts/runCubemapLoop2Front.sh analog).
set -euo pipefail
DATA=${1:?dataset dir}
OUT=${2:-out/loop2_front}
mkdir -p "$OUT"
python -m cubemapslam_tpu.apps.run_fangshan \
    none \
    "${CONFIG:-Config/front_cam_params.yaml}" \
    "$DATA/images" \
    "$DATA/image_list.txt" \
    "${MASK:-none}" \
    "$OUT/keyframe_trajectory.txt" \
    "$OUT/perf.txt"

#!/usr/bin/env bash
# 3D replay of a finished run: reconstructed mesh + camera frusta +
# trajectory + planning-path + look-at overlays, depth-tested through the
# C++ raycaster (parity with scripts/evaluation/visualize_naruto.sh, which
# drives the reference's Open3D visualizer on the saved artifact dir).
# Needs a run recorded with --enable_vis 1 (artifact saver).
#
#   ./scripts/visualize_naruto.sh results/EXP/Replica/office0/seed_0 out/
set -euo pipefail

RUN_DIR=${1:?run dir (result_dir of a run recorded with --enable_vis 1)}
OUT=${2:-$RUN_DIR/replay}
STRIDE=${3:-1}

VIS_DIR=$(ls -d "$RUN_DIR"/*/*/visualization "$RUN_DIR"/visualization \
          2>/dev/null | head -1 || true)
: "${VIS_DIR:?no visualization/ artifact dir under $RUN_DIR — rerun with --enable_vis 1}"

python -m naruto_tpu.visualization.offline replay \
    --run "$VIS_DIR" --out "$OUT" --stride "$STRIDE" \
    --video "$OUT/replay.mp4"

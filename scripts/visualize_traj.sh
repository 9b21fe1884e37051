#!/usr/bin/env bash
# Trajectory plot over a run's saved pose artifacts (parity with
# scripts/evaluation/visualize_traj.sh). Needs --enable_vis 1 artifacts.
#
#   ./scripts/visualize_traj.sh results/EXP/Replica/office0/seed_0 traj.png
set -euo pipefail

RUN_DIR=${1:?run dir}
OUT=${2:-$RUN_DIR/traj.png}

VIS_DIR=$(ls -d "$RUN_DIR"/*/*/visualization "$RUN_DIR"/visualization \
          2>/dev/null | head -1 || true)
: "${VIS_DIR:?no visualization/ artifact dir under $RUN_DIR — rerun with --enable_vis 1}"

python -m naruto_tpu.visualization.offline traj --run "$VIS_DIR" --out "$OUT"

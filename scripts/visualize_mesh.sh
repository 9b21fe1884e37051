#!/usr/bin/env bash
# Mesh-evolution rendering across a run's periodic mesh checkpoints,
# plus pose export from the final checkpoint (parity with
# scripts/evaluation/visualize_mesh.sh: export_pose -> vis_mesh_evo).
#
#   ./scripts/visualize_mesh.sh results/EXP/Replica/office0/seed_0 out/
set -euo pipefail

RUN_DIR=${1:?run dir}
OUT=${2:-$RUN_DIR/mesh_evo}

CKPT=$(ls "$RUN_DIR"/*/*/ckpt_*_final.pkl "$RUN_DIR"/ckpt_*_final.pkl \
       2>/dev/null | head -1 || true)
if [ -n "${CKPT:-}" ]; then
  python -m naruto_tpu.export_pose --ckpt "$CKPT" --out "$CKPT.pose.npy"
fi

# prefer the saver's color_mesh artifacts; fall back to the engine's
# periodic mesh/ snapshots (written on every run, no --enable_vis needed)
VIS_DIR=$(ls -d "$RUN_DIR"/*/*/visualization "$RUN_DIR"/visualization \
          2>/dev/null | head -1 || true)
if [ -n "${VIS_DIR:-}" ] && ls "$VIS_DIR"/color_mesh/*.ply >/dev/null 2>&1
then
  python -m naruto_tpu.visualization.offline mesh_evo \
      --run "$VIS_DIR" --out "$OUT"
else
  MESH_DIR=$(ls -d "$RUN_DIR"/*/*/mesh "$RUN_DIR"/mesh 2>/dev/null | head -1 || true)
  : "${MESH_DIR:?no mesh/ dir under $RUN_DIR}"
  python -m naruto_tpu.visualization.offline mesh_evo \
      --run "$(dirname "$MESH_DIR")" --out "$OUT" --kind mesh
fi

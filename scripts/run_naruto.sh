#!/usr/bin/env bash
# Multi-scene NARUTO-dataset driver (parity with the reference's
# scripts/naruto/run_naruto.sh: scene|all, trial count, experiment name).
# NARUTO scenes are object-centric captures; runs use the analytic sim
# unless a scene mesh is supplied (raycast backend, .ply or .glb).
#
#   ./scripts/run_naruto.sh naruto 1 EXP1              # one scene, 1 trial
#   ./scripts/run_naruto.sh all 1 EXP1 raycast /data   # all scenes
set -euo pipefail

SCENE=${1:-naruto}
NUM_TRIALS=${2:-1}
EXP=${3:-default}
SIM=${4:-analytic}
DATA_DIR=${5:-}

SEEDS=(0)                      # reference: run_naruto.sh seeds=(0)
SCENES=(naruto jiraiya hokage_room)
[ "$SCENE" != "all" ] && SCENES=("$SCENE")

for scene in "${SCENES[@]}"; do
  for i in $(seq 0 $((NUM_TRIALS - 1))); do
    seed=${SEEDS[$i]:-$((i * 500))}
    result_dir="results/$EXP/NARUTO/$scene/seed_$seed"
    args=(--dataset NARUTO --scene "$scene" --seed "$seed"
          --result_dir "$result_dir" --sim "$SIM")
    if [ -n "$DATA_DIR" ]; then
      mesh=$(ls "$DATA_DIR/$scene"/mesh.ply "$DATA_DIR/$scene"/mesh.glb \
             2>/dev/null | head -1 || true)
      : "${mesh:?no mesh.ply/.glb under $DATA_DIR/$scene}"
      args+=(--scene_path "$mesh")
    fi
    echo "=== NARUTO/$scene seed=$seed -> $result_dir"
    python -m naruto_tpu.run "${args[@]}"
  done
done

for scene in "${SCENES[@]}"; do
  python -m naruto_tpu.utils.results \
    --scene-dir "results/$EXP/NARUTO/$scene" || true
done

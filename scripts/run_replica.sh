#!/usr/bin/env bash
# Multi-scene, multi-seed Replica driver (parity with the reference's
# scripts/naruto/run_replica.sh: scene|all, trial count, experiment name).
#
#   ./scripts/run_replica.sh office0 1 EXP1            # one scene, 1 trial
#   ./scripts/run_replica.sh all 5 EXP1 raycast /data  # all scenes, 5 seeds
set -euo pipefail

SCENE=${1:-office0}
NUM_TRIALS=${2:-1}
EXP=${3:-default}
SIM=${4:-analytic}
DATA_DIR=${5:-}

SEEDS=(0 500 1000 1500 1999)   # reference trial seeds (run_replica.sh:24)
SCENES=(office0 office1 office2 office3 office4 room0 room1 room2)
[ "$SCENE" != "all" ] && SCENES=("$SCENE")

for scene in "${SCENES[@]}"; do
  for i in $(seq 0 $((NUM_TRIALS - 1))); do
    seed=${SEEDS[$i]}
    result_dir="results/$EXP/Replica/$scene/seed_$seed"
    args=(--dataset Replica --scene "$scene" --seed "$seed"
          --result_dir "$result_dir" --sim "$SIM")
    if [ -n "$DATA_DIR" ]; then
      args+=(--scene_path "$DATA_DIR/$scene/mesh.ply")
    fi
    echo "=== Replica/$scene seed=$seed -> $result_dir"
    python -m naruto_tpu.run "${args[@]}"
  done
done

# merged per-seed metric tables (mean/std rows) per scene
for scene in "${SCENES[@]}"; do
  python -m naruto_tpu.utils.results \
    --scene-dir "results/$EXP/Replica/$scene" || true
done

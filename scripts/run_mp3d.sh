#!/usr/bin/env bash
# MP3D driver (parity with scripts/naruto/run_mp3d.sh: 5000-step budget).
set -euo pipefail

SCENE=${1:-gZ6f7yhEvPG}
NUM_TRIALS=${2:-1}
EXP=${3:-default}
SIM=${4:-analytic}
DATA_DIR=${5:-}

SEEDS=(0 500 1000 1500 1999)
SCENES=(GdvgFV5R1Z5 HxpKQynjfin YmJkqBEsHnH gZ6f7yhEvPG pLe4wQe7qrG)
[ "$SCENE" != "all" ] && SCENES=("$SCENE")

for scene in "${SCENES[@]}"; do
  for i in $(seq 0 $((NUM_TRIALS - 1))); do
    seed=${SEEDS[$i]}
    result_dir="results/$EXP/MP3D/$scene/seed_$seed"
    args=(--dataset MP3D --scene "$scene" --seed "$seed"
          --result_dir "$result_dir" --sim "$SIM")
    if [ -n "$DATA_DIR" ]; then
      args+=(--scene_path "$DATA_DIR/$scene/mesh.ply")
    fi
    echo "=== MP3D/$scene seed=$seed -> $result_dir"
    python -m naruto_tpu.run "${args[@]}"
  done
done

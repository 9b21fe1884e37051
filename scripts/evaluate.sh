#!/usr/bin/env bash
# Evaluate a finished run against a ground-truth mesh (parity with
# scripts/evaluation/eval_replica.sh: cull -> recon metrics -> MAD -> traj).
#
#   ./scripts/evaluate.sh results/EXP/Replica/office0/seed_0 gt/office0.ply
set -euo pipefail

RUN_DIR=${1:?run dir}
GT=${2:?ground-truth mesh (ply)}
DATASET=${3:-Replica}
SCENE=${4:-office0}

REC=$(ls "$RUN_DIR"/Replica/*/mesh_*_final.ply "$RUN_DIR"/mesh_*_final.ply \
      2>/dev/null | head -1 || true)
CKPT=$(ls "$RUN_DIR"/Replica/*/ckpt_*_final.pkl "$RUN_DIR"/ckpt_*_final.pkl \
      2>/dev/null | head -1 || true)
: "${REC:?no final mesh under $RUN_DIR}"
: "${CKPT:?no final checkpoint under $RUN_DIR}"

python -m naruto_tpu.evaluate --rec "$REC" --gt "$GT" --ckpt "$CKPT" \
    --dataset "$DATASET" --scene "$SCENE" --cull \
    --out "$RUN_DIR/eval_result.txt"

#!/bin/bash
# Round-4c hardware queue — runs AFTER hw_queue_r4b.sh exits (single-
# client TPU). Ordered by information value per minute, with a hard
# deadline guard so the driver bench finds a free device + warm cache:
#
#   1. fresh BA device trace + summary (post-r4-flips glue decomposition)
#   2. glue A/B: active-ray top-k via full argsort (NARUTO_TOPK_VIA_SORT)
#   3. MP3D-scale raycast validation: pLe4wQe7qrG 5000-step active run
#      through the C++ BVH on the generated 3M-face mesh
#   4. exploration-mitigation A/B: analytic seeds with trav_mask_decay=10
#      (weak seeds first: 0, 1999, then 500/1000/1500 as time allows)
#   5. final default bench (leaves the driver-bench graph warm)
#
# DEADLINE_UTC: no new long step starts after this (HH:MM today).
set -u
cd /root/repo
LOG=results/r4c_queue.log
mkdir -p results
DEADLINE_UTC="${DEADLINE_UTC:-08:50}"
echo "[r4c] up $(date -u) deadline=$DEADLINE_UTC" | tee -a "$LOG"

past_deadline() {
    [ "$(date -u +%H:%M)" \> "$DEADLINE_UTC" ]
}

bench_step() {
    local label="$1"; shift
    echo "=== $label" | tee -a "$LOG"
    timeout 3600 env NARUTO_BENCH_STEPS=60 "$@" python bench.py \
        2>>results/r4c_queue.stderr | tee -a "$LOG"
    echo "[r4c] $(date -u +%H:%M:%S) done: $label (rc=${PIPESTATUS[0]})" \
        | tee -a "$LOG"
}

echo "=== 1. BA device trace (r4 default graph)" | tee -a "$LOG"
timeout 2700 python scripts/profile_ba.py --trace-dir /tmp/ba_trace_r4 \
    >>results/r4c_queue.stderr 2>&1
python scripts/trace_summary.py /tmp/ba_trace_r4 --top 40 \
    > results/r4_trace_summary.txt 2>>results/r4c_queue.stderr
echo "[r4c] $(date -u +%H:%M:%S) trace done" | tee -a "$LOG"

bench_step "2. glue A/B: topk via argsort" \
    NARUTO_TOPK_VIA_SORT=1 NARUTO_BENCH_TURBO=0

if ! past_deadline; then
    echo "=== 3. MP3D-scale raycast validation (pLe4wQe7qrG, 5000 steps)" \
        | tee -a "$LOG"
    out=results/mp3d_raycast/pLe4wQe7qrG
    if [ ! -f "$out/MP3D/pLe4wQe7qrG/eval_result.txt" ]; then
        t0=$(date +%s)
        timeout 12600 python -m naruto_tpu.run \
            --cfg configs/MP3D/pLe4wQe7qrG/naruto.yaml --seed 0 \
            --sim raycast --scene_path data/MP3D/pLe4wQe7qrG/mesh.ply \
            --result_dir "$out" >>results/r4c_queue.stderr 2>&1
        rc=$?
        echo "[r4c] mp3d raycast rc=$rc wall=$((($(date +%s)-t0)/60))min" \
            | tee -a "$LOG"
        tail -2 "$out/MP3D/pLe4wQe7qrG/eval_result.txt" 2>/dev/null \
            | tee -a "$LOG"
    fi
fi

for seed in 0 1999 500 1000 1500; do
    past_deadline && { echo "[r4c] deadline; skip seed $seed" \
        | tee -a "$LOG"; break; }
    out=results/seeds_r4_explore/Replica/office0/seed_$seed
    if [ -f "$out/Replica/office0/eval_result.txt" ]; then continue; fi
    echo "=== 4. goal-repeat-penalty A/B seed $seed" | tee -a "$LOG"
    timeout 5400 python -m naruto_tpu.run \
        --cfg configs/ab/office0_explore.yaml --seed "$seed" \
        --result_dir "$out" >>results/r4c_queue.stderr 2>&1
    echo "[r4c] $(date -u +%H:%M:%S) seed $seed rc=$?" | tee -a "$LOG"
    tail -1 "$out/Replica/office0/eval_result.txt" 2>/dev/null \
        | tee -a "$LOG"
done
if [ -d results/seeds_r4_explore/Replica/office0 ]; then
    python -m naruto_tpu.utils.results \
        --scene-dir results/seeds_r4_explore/Replica/office0 \
        2>>results/r4c_queue.stderr | tee -a "$LOG"
fi

bench_step "5. final default bench (cache re-warm)" NARUTO_DUMMY=0
echo "[r4c] queue complete $(date -u)" | tee -a "$LOG"

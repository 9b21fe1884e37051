#!/bin/bash
# Round-4b hardware queue (fresh container: .jax_cache and data/ were
# wiped again, so every step re-pays its remote compile once).
# Serializes ALL remaining round-4 device work on the single-client TPU:
#
#   1. default bench  (bracket-open; re-warms the driver-bench graph)
#   2. turbo bench    (warms the turbo graph; expect ~105 it/s)
#   3. passive fixed-trajectory run, r4 parity default -> quality base row
#   4. passive fixed-trajectory run, turbo             -> quality price row
#   5. the 4 remaining raycast protocol seeds (seeds_supervisor_r4.sh)
#   6. default bench  (bracket-close; leaves the cache warm for the driver)
#
# Bracket rule (PERFORMANCE.md r4 decision table): if steps 1 and 6
# disagree >20%, treat every number in between as device-state-suspect.
set -u
cd /root/repo
LOG=results/r4b_queue.log
mkdir -p results
echo "[r4b] up $(date -u)" | tee -a "$LOG"

bench_step() {
    local label="$1"; shift
    echo "=== $label" | tee -a "$LOG"
    echo "[r4b] $(date -u +%H:%M:%S) start: $label" | tee -a "$LOG"
    timeout 3600 env NARUTO_BENCH_STEPS=60 "$@" python bench.py \
        2>>results/r4b_queue.stderr | tee -a "$LOG"
    echo "[r4b] $(date -u +%H:%M:%S) done: $label (rc=${PIPESTATUS[0]})" \
        | tee -a "$LOG"
}

run_step() {
    local label="$1" cfg="$2" out="$3" tmo="$4"
    if [ -f "$out/Replica/office0/eval_result.txt" ]; then
        echo "[r4b] $label already recorded" | tee -a "$LOG"; return
    fi
    echo "=== $label" | tee -a "$LOG"
    echo "[r4b] $(date -u +%H:%M:%S) start: $label" | tee -a "$LOG"
    timeout "$tmo" python -m naruto_tpu.run --cfg "$cfg" \
        --result_dir "$out" >>results/r4b_queue.stderr 2>&1
    local rc=$?
    tail -2 "$out"/Replica/office0/eval_result.txt 2>/dev/null | tee -a "$LOG"
    echo "[r4b] $(date -u +%H:%M:%S) done: $label (rc=$rc)" | tee -a "$LOG"
}

bench_step "1. default bench (bracket-open)" NARUTO_DUMMY=0
bench_step "2. turbo bench" \
    NARUTO_BENCH_CFG='{"training": {"smooth_every": 5, "n_samples_d": 12}}'
run_step "3. passive traj A/B: r4 parity default" \
    configs/ab/passive_traj_ab.yaml results/ab_r4_parity_traj 7200
run_step "4. passive traj A/B: turbo" \
    configs/ab/passive_traj_turbo.yaml results/ab_r4_turbo_traj 7200
echo "=== 5. raycast protocol seeds" | tee -a "$LOG"
bash scripts/seeds_supervisor_r4.sh
echo "[r4b] seeds done $(date -u)" | tee -a "$LOG"
bench_step "6. default bench (bracket-close)" NARUTO_DUMMY=0
echo "[r4b] queue complete $(date -u)" | tee -a "$LOG"

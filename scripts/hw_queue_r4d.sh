#!/bin/bash
# Round-4d hardware queue — runs AFTER hw_queue_r4c.sh completes (the
# launcher polls for r4c's "queue complete" line or its process exit;
# single-client TPU). Contents, by information value per minute:
#
#   1. glue A/B: BA scan unroll=2 (NARUTO_SCAN_UNROLL — prices the scan
#      carry-plumbing glue; fresh compile ~2-5 min, persistent-cached)
#   2. seed_1999 rescue A/B: raycast full-budget run with
#      planner.collision_sim_override=0.05 (configs/ab/office0_simguard.yaml)
#      — the diagnosed phantom-SDF livelock seed
#   3. final default bench (verifies the device is free + the driver-
#      bench graph warm)
#
# DEADLINE_UTC: no new long step starts after this (HH:MM today).
set -u
cd /root/repo
LOG=results/r4d_queue.log
mkdir -p results
DEADLINE_UTC="${DEADLINE_UTC:-11:10}"
echo "[r4d] up $(date -u) deadline=$DEADLINE_UTC" | tee -a "$LOG"

past_deadline() {
    [ "$(date -u +%H:%M)" \> "$DEADLINE_UTC" ]
}

bench_step() {
    local label="$1"; shift
    echo "=== $label" | tee -a "$LOG"
    timeout 3600 env NARUTO_BENCH_STEPS=60 "$@" python bench.py \
        2>>results/r4d_queue.stderr | tee -a "$LOG"
    echo "[r4d] $(date -u +%H:%M:%S) done: $label (rc=${PIPESTATUS[0]})" \
        | tee -a "$LOG"
}

bench_step "1. glue A/B: scan unroll=2" \
    NARUTO_SCAN_UNROLL=2 NARUTO_BENCH_TURBO=0
bench_step "1b. turbo + scan unroll=2" \
    NARUTO_SCAN_UNROLL=2 NARUTO_BENCH_TURBO=0 \
    NARUTO_BENCH_CFG='{"training": {"smooth_every": 5, "n_samples_d": 12}}'

if ! past_deadline; then
    echo "=== 2. seed_1999 simguard rescue (raycast, full budget)" \
        | tee -a "$LOG"
    out=results/seeds_r4_simguard/Replica/office0/seed_1999
    if [ ! -f "$out/Replica/office0/eval_result.txt" ]; then
        t0=$(date +%s)
        timeout 5400 python -m naruto_tpu.run \
            --cfg configs/ab/office0_simguard.yaml --seed 1999 \
            --sim raycast --scene_path data/Replica/office0/mesh.ply \
            --result_dir "$out" >>results/r4d_queue.stderr 2>&1
        rc=$?
        echo "[r4d] $(date -u +%H:%M:%S) rescue rc=$rc wall=$((($(date +%s)-t0)/60))min" \
            | tee -a "$LOG"
    fi
    tail -1 "$out/Replica/office0/eval_result.txt" 2>/dev/null \
        | tee -a "$LOG"
    python - <<'EOF' 2>/dev/null | tee -a "$LOG"
import json
p = ("results/seeds_r4_simguard/Replica/office0/seed_1999/"
     "Replica/office0/planner_stats.json")
try:
    s = json.load(open(p))["summary"]
    print({k: s[k] for k in ("collisions", "collision_overrides",
                             "n_plans", "uncert_mass_last") if k in s})
except FileNotFoundError:
    pass
EOF
fi

bench_step "3. final default bench (device-free check + warm)" \
    NARUTO_DUMMY=0
echo "[r4d] queue complete $(date -u)" | tee -a "$LOG"

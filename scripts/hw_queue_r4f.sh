#!/bin/bash
# Round-4f follow-up device queue (session 5). Waits for hw_queue_r4e.sh
# (MP3D raycast validation + final bench) to release the single-client
# TPU claim, then:
#   1. seed_1999 composed rescue: simguard + goal_repeat_penalty=1.0
#      with collision-charges-a-visit accrual (configs/ab/office0_rescue.yaml)
#   2. bracket-open default bench (parity + turbo rows, both warm)
#   3. scan-unroll=2 A/B on BOTH graphs (NARUTO_SCAN_UNROLL=2 +
#      NARUTO_BENCH_TURBO=1 — the r4d leftover glue A/B; two fresh
#      ~85 s compiles, persistent-cached)
#   4. bracket-close default bench (device-free check + leaves the
#      driver graph warm in .jax_cache for the round-end driver bench)
# DEADLINE_UTC: no new long step starts after this (HH:MM today).
set -u
cd /root/repo
LOG=results/r4f_queue.log
mkdir -p results
DEADLINE_UTC="${DEADLINE_UTC:-12:45}"
echo "[r4f] up $(date -u) deadline=$DEADLINE_UTC" | tee -a "$LOG"

past_deadline() {
    # epoch compare (ADVICE r4: HH:MM string compare wraps at midnight).
    # DEADLINE_UTC may be HH:MM (today) or a full date string.
    local dl
    dl=$(date -u -d "$DEADLINE_UTC" +%s 2>/dev/null) || return 1
    [ "$(date -u +%s)" -gt "$dl" ]
}

# 0. wait for the r4e queue to exit (watch only — never kill by pattern)
for _ in $(seq 1 480); do
    pgrep -f hw_queue_r4e.sh >/dev/null || break
    sleep 30
done
echo "[r4f] r4e queue gone at $(date -u +%H:%M:%S)" | tee -a "$LOG"

# 1. composed rescue run (full budget, raycast backend, ~45 min warm)
if ! past_deadline; then
    echo "=== 1. seed_1999 composed rescue (simguard + repeat penalty)" \
        | tee -a "$LOG"
    out=results/seeds_r4_rescue/Replica/office0/seed_1999
    if [ ! -f "$out/Replica/office0/eval_result.txt" ]; then
        t0=$(date +%s)
        timeout 5400 python -m naruto_tpu.run \
            --cfg configs/ab/office0_rescue.yaml --seed 1999 \
            --sim raycast --scene_path data/Replica/office0/mesh.ply \
            --result_dir "$out" >>results/r4f_queue.stderr 2>&1
        rc=$?
        echo "[r4f] $(date -u +%H:%M:%S) rescue rc=$rc wall=$((($(date +%s)-t0)/60))min" \
            | tee -a "$LOG"
    fi
    tail -1 "$out/Replica/office0/eval_result.txt" 2>/dev/null \
        | tee -a "$LOG"
    python - <<'EOF' 2>/dev/null | tee -a "$LOG"
import json
p = ("results/seeds_r4_rescue/Replica/office0/seed_1999/"
     "Replica/office0/planner_stats.json")
try:
    s = json.load(open(p))["summary"]
    print({k: s[k] for k in ("collisions", "collision_overrides",
                             "goal_repeat_max", "n_plans",
                             "uncert_mass_last") if k in s})
except FileNotFoundError:
    pass
EOF
fi

bench_step() {
    local label="$1"; shift
    echo "=== $label" | tee -a "$LOG"
    timeout 7200 env NARUTO_BENCH_STEPS=60 \
        NARUTO_BENCH_DEVICE_TIMEOUT=5400 "$@" python bench.py \
        2>>results/r4f_queue.stderr | tee -a "$LOG"
    echo "[r4f] $(date -u +%H:%M:%S) done: $label (rc=${PIPESTATUS[0]})" \
        | tee -a "$LOG"
}

# 2. bracket-open default bench (parity + turbo, warm from r4e)
bench_step "2. default bench (bracket open, parity+turbo)" \
    NARUTO_BENCH_TURBO=1

# 3. scan-unroll=2 A/B on both graphs (r4d leftover)
if ! past_deadline; then
    bench_step "3. glue A/B: scan unroll=2 (parity+turbo)" \
        NARUTO_SCAN_UNROLL=2 NARUTO_BENCH_TURBO=1
fi

# 4. bracket-close default bench (device-free check + warms the
# driver-bench graph LAST in the persistent cache)
bench_step "4. default bench (bracket close)" NARUTO_DUMMY=0
echo "[r4f] queue complete $(date -u)" | tee -a "$LOG"

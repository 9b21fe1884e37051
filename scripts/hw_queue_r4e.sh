#!/bin/bash
# Round-4e hardware queue (session 4; fresh container again: .jax_cache,
# data/ and /tmp all wiped — office0 assets regenerated before launch).
# Ordered by information value per minute under the driver-bench deadline:
#
#   0. wait for the CPU test suite (single core — keeps the timed bench
#      windows uncontended) and for the single-client TPU claim (bench's
#      own acquisition watchdog, long timeout + retry)
#   1. parity+turbo warm bench (NARUTO_BENCH_TURBO=1) — re-pays the two
#      cold remote compiles ONCE into .jax_cache so the driver bench at
#      round end is warm and emits the turbo extra row
#   2. seed_1999 simguard rescue (r4d leftover): the diagnosed
#      phantom-SDF livelock seed re-run with
#      planner.collision_sim_override=0.05 (configs/ab/office0_simguard.yaml)
#   3. MP3D-scale raycast validation (pLe4wQe7qrG, 5000 steps) if before
#      deadline — r4c leftover; mesh generated on CPU while waiting
#   4. final default bench (device-free check + driver-graph warm)
#
# DEADLINE_UTC: no new long step starts after this (HH:MM today).
set -u
cd /root/repo
LOG=results/r4e_queue.log
mkdir -p results
DEADLINE_UTC="${DEADLINE_UTC:-09:30}"
echo "[r4e] up $(date -u) deadline=$DEADLINE_UTC" | tee -a "$LOG"

past_deadline() {
    # epoch compare (ADVICE r4: HH:MM string compare wraps at midnight).
    # DEADLINE_UTC may be HH:MM (today) or a full date string.
    local dl
    dl=$(date -u -d "$DEADLINE_UTC" +%s 2>/dev/null) || return 1
    [ "$(date -u +%s)" -gt "$dl" ]
}

bench_step() {
    local label="$1"; shift
    echo "=== $label" | tee -a "$LOG"
    timeout 7200 env NARUTO_BENCH_STEPS=60 \
        NARUTO_BENCH_DEVICE_TIMEOUT=5400 "$@" python bench.py \
        2>>results/r4e_queue.stderr | tee -a "$LOG"
    echo "[r4e] $(date -u +%H:%M:%S) done: $label (rc=${PIPESTATUS[0]})" \
        | tee -a "$LOG"
}

# 0. let the CPU work finish first (one CPU core: pytest + MP3D mesh
# generation contend with the bench dispatch loop and would distort
# timed windows). The launcher touches /tmp/cpu_work_done when both the
# test suite and the MP3D asset generation have finished.
for _ in $(seq 1 150); do
    [ -f /tmp/cpu_work_done ] && break
    sleep 30
done
echo "[r4e] cpu work done=$(cat /tmp/cpu_work_done 2>/dev/null || echo timeout)" \
    | tee -a "$LOG"

# 1. warm bench: parity + turbo (two cold compiles, persistent-cached).
# Retry while the single-client claim is held elsewhere (error JSON rows).
for attempt in 1 2 3; do
    bench_step "1. warm bench parity+turbo (attempt $attempt)" \
        NARUTO_BENCH_TURBO=1
    grep -q '"error"' <(tail -2 "$LOG") || break
    echo "[r4e] device still claimed; retrying in 5 min" | tee -a "$LOG"
    sleep 300
done

# 2. seed_1999 simguard rescue (full budget, raycast backend)
if ! past_deadline; then
    echo "=== 2. seed_1999 simguard rescue (raycast, full budget)" \
        | tee -a "$LOG"
    out=results/seeds_r4_simguard/Replica/office0/seed_1999
    if [ ! -f "$out/Replica/office0/eval_result.txt" ]; then
        t0=$(date +%s)
        timeout 5400 python -m naruto_tpu.run \
            --cfg configs/ab/office0_simguard.yaml --seed 1999 \
            --sim raycast --scene_path data/Replica/office0/mesh.ply \
            --result_dir "$out" >>results/r4e_queue.stderr 2>&1
        rc=$?
        echo "[r4e] $(date -u +%H:%M:%S) rescue rc=$rc wall=$((($(date +%s)-t0)/60))min" \
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

# 3. MP3D-scale raycast validation (needs the generated 3M-face mesh)
if ! past_deadline && [ -f data/MP3D/pLe4wQe7qrG/mesh.ply ]; then
    echo "=== 3. MP3D-scale raycast validation (pLe4wQe7qrG, 5000 steps)" \
        | tee -a "$LOG"
    out=results/mp3d_raycast/pLe4wQe7qrG
    if [ ! -f "$out/MP3D/pLe4wQe7qrG/eval_result.txt" ]; then
        t0=$(date +%s)
        timeout 10800 python -m naruto_tpu.run \
            --cfg configs/MP3D/pLe4wQe7qrG/naruto.yaml --seed 0 \
            --sim raycast --scene_path data/MP3D/pLe4wQe7qrG/mesh.ply \
            --result_dir "$out" >>results/r4e_queue.stderr 2>&1
        rc=$?
        echo "[r4e] mp3d raycast rc=$rc wall=$((($(date +%s)-t0)/60))min" \
            | tee -a "$LOG"
    fi
    tail -2 "$out/MP3D/pLe4wQe7qrG/eval_result.txt" 2>/dev/null \
        | tee -a "$LOG"
fi

# 4. final default bench (device-free check + leaves the driver graph warm)
bench_step "4. final default bench" NARUTO_DUMMY=0
echo "[r4e] queue complete $(date -u)" | tee -a "$LOG"

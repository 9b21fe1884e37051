#!/bin/bash
# Round-5 device queue. Fresh container (cache + data wiped again), so the
# FIRST job re-pays the parity+turbo bench compiles into .jax_cache (the
# round-end driver bench must find them warm). Then, in VERDICT-priority
# order: fresh BA trace (glue-gap targeting), scene-breadth protocol
# (hokage_room NARUTO glb; room0/office3 x3 raycast seeds), seed_500
# diagnostic rerun with mesh artifacts, second MP3D datapoint, and a
# final re-warm. Every step is budget-gated against an EPOCH deadline
# (advisor r4: HH:MM string compares wrap across midnight).
set -u
cd /root/repo
LOG=results/r5_queue.log
ERR=results/r5_queue.stderr
mkdir -p results
# default hard exit: 2026-08-20 07:50 UTC (driver bench expected ~09:00)
DEADLINE_EPOCH="${DEADLINE_EPOCH:-$(date -u -d '2026-08-20 07:50' +%s)}"
LOCK=/tmp/naruto_hw_queue.lock
echo $$ > "$LOCK"
echo "[r5] up $(date -u) deadline_epoch=$DEADLINE_EPOCH" | tee -a "$LOG"

budget_s() {
    local now
    now=$(date -u +%s)
    echo $(( DEADLINE_EPOCH > now ? DEADLINE_EPOCH - now : 0 ))
}

run_gated() {  # run_gated <min_budget_s> <label> <cmd...>
    local need=$1 label=$2
    shift 2
    local b
    b=$(budget_s)
    if [ "$b" -lt "$need" ]; then
        echo "[r5] SKIP $label (budget ${b}s < ${need}s)" | tee -a "$LOG"
        return 1
    fi
    echo "=== [r5] $label start $(date -u +%H:%M:%S) budget=${b}s" | tee -a "$LOG"
    local t0 rc
    t0=$(date +%s)
    timeout "$b" "$@" >>"$ERR" 2>&1
    rc=$?
    echo "[r5] $label rc=$rc wall=$((($(date +%s)-t0)/60))min" | tee -a "$LOG"
    return $rc
}

# A/B injection hook: once the fresh trace is analyzed mid-round, glue-fix
# candidates land in scripts/r5_ab_hook.sh; the queue runs it at the next
# step boundary (single device claim, no process killing). The hook is
# responsible for its own idempotence (it is invoked repeatedly).
run_hook() {
    [ -x scripts/r5_ab_hook.sh ] || return 0
    echo "[r5] running A/B hook $(date -u +%H:%M:%S)" | tee -a "$LOG"
    bash scripts/r5_ab_hook.sh >>"$ERR" 2>&1
    echo "[r5] A/B hook rc=$? done $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

# 0. device probe: tiny matmul with timeout; retry until the claim frees
for i in $(seq 1 60); do
    if timeout 300 python - >>"$ERR" 2>&1 << 'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print(float((x @ x).sum()))
EOF
    then
        echo "[r5] device probe OK (attempt $i)" | tee -a "$LOG"
        break
    fi
    echo "[r5] device busy/wedged, retry $i $(date -u +%H:%M:%S)" | tee -a "$LOG"
    sleep 60
done

# 1. warm bench: parity + turbo compiles into .jax_cache, honest numbers
run_gated 3600 "bench_warm" python bench.py && tail -1 "$ERR" | tee -a "$LOG"

# 2. fresh BA device trace -> git-trackable summary
if run_gated 2400 "ba_trace" python scripts/profile_ba.py --trace-dir /tmp/ba_trace_r5; then
    python scripts/trace_summary.py /tmp/ba_trace_r5 --top 50 \
        > results/r5_trace_summary.txt 2>>"$ERR" \
        && echo "[r5] trace summary -> results/r5_trace_summary.txt" | tee -a "$LOG"
fi

# 3. NARUTO glb end-to-end (all-three collision rule + gltf path)
out=results/naruto_glb/NARUTO/hokage_room/seed_0
if [ ! -f "$out/NARUTO/hokage_room/eval_result.txt" ]; then
    run_gated 5400 "hokage_room_glb" python -m naruto_tpu.run \
        --dataset NARUTO --scene hokage_room --seed 0 \
        --sim raycast --scene_path data/NARUTO/hokage_room/mesh.glb \
        --result_dir "$out"
    tail -1 "$out/NARUTO/hokage_room/eval_result.txt" 2>/dev/null | tee -a "$LOG"
fi

run_hook

# 4. scene breadth: room0 + office3, 3 raycast seeds each (parity default)
for scene in room0 office3; do
    for seed in 0 500 1000; do
        out=results/seeds_r5/Replica/$scene/seed_$seed
        [ -f "$out/Replica/$scene/eval_result.txt" ] && continue
        run_gated 3600 "${scene}_seed_${seed}" python -m naruto_tpu.run \
            --dataset Replica --scene "$scene" --seed "$seed" \
            --sim raycast --scene_path "data/Replica/$scene/mesh.ply" \
            --result_dir "$out"
        tail -1 "$out/Replica/$scene/eval_result.txt" 2>/dev/null | tee -a "$LOG"
    done
    python -m naruto_tpu.utils.results \
        --scene-dir "results/seeds_r5/Replica/$scene" >>"$ERR" 2>&1 || true
done

run_hook

# 5. seed_500 diagnostic rerun (rescue cfg) KEEPING mesh artifacts for
#    completion-gap localization (scripts/completion_gaps.py)
out=results/diag_seed500/Replica/office0
if [ ! -f "$out/Replica/office0/eval_result.txt" ]; then
    run_gated 3600 "seed500_diag" python -m naruto_tpu.run \
        --cfg configs/ab/office0_rescue.yaml --seed 500 \
        --sim raycast --scene_path data/Replica/office0/mesh.ply \
        --result_dir "$out"
    tail -1 "$out/Replica/office0/eval_result.txt" 2>/dev/null | tee -a "$LOG"
    PYTHONPATH=. python scripts/completion_gaps.py \
        --run "$out/Replica/office0" \
        > results/diag_seed500/completion_gaps.txt 2>>"$ERR" || true
fi

run_hook

# 6. second MP3D-scale datapoint (seed 1; r4 ran seed 0 only)
out=results/mp3d_raycast_seed1/pLe4wQe7qrG
if [ ! -f "$out/MP3D/pLe4wQe7qrG/eval_result.txt" ]; then
    run_gated 7200 "mp3d_seed1" python -m naruto_tpu.run \
        --dataset MP3D --scene pLe4wQe7qrG --seed 1 \
        --sim raycast --scene_path data/MP3D/pLe4wQe7qrG/mesh.ply \
        --result_dir "$out"
    tail -1 "$out/MP3D/pLe4wQe7qrG/eval_result.txt" 2>/dev/null | tee -a "$LOG"
fi

run_hook

# 7. final re-warm: make sure the CURRENT default graph is cached for the
#    driver bench (no-op if nothing flipped since step 1)
run_gated 1200 "bench_final" python bench.py && tail -1 "$ERR" | tee -a "$LOG"

rm -f "$LOCK"
echo "[r5] queue complete $(date -u)" | tee -a "$LOG"

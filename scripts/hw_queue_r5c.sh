#!/bin/bash
# Round-5 session-8 follow-on queue: starts after hw_queue_r5b.sh frees
# the single-client device claim, uses the window between r5b's 09:45
# deadline and the driver bench (~12:20). Completes whatever r5b's budget
# gates skipped, in value order:
#   1. A/B hook (stage 4 combined-default warm, stage 5 bf16-conv pricing)
#   2. leftover room0/office3 raycast seeds + per-scene merges
#   3. seed_500 rescue diag, MP3D seed 1
#   4. final warm bench (driver bench MUST find the flipped graphs warm)
set -u
cd /root/repo
LOG=results/r5_queue.log
ERR=results/r5_queue.stderr
mkdir -p results
DEADLINE_EPOCH="${DEADLINE_EPOCH:-$(date -u -d '2026-08-20 11:40' +%s)}"
LOCK=/tmp/naruto_hw_queue.lock

# wait for r5b: its lock file holds its pid; stale lock = dead pid
while [ -f "$LOCK" ] && kill -0 "$(cat "$LOCK" 2>/dev/null)" 2>/dev/null; do
    sleep 60
done
echo $$ > "$LOCK"
echo "[r5c] up $(date -u) deadline_epoch=$DEADLINE_EPOCH" | tee -a "$LOG"

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
        echo "[r5c] SKIP $label (budget ${b}s < ${need}s)" | tee -a "$LOG"
        return 1
    fi
    echo "=== [r5c] $label start $(date -u +%H:%M:%S) budget=${b}s" | tee -a "$LOG"
    local t0 rc
    t0=$(date +%s)
    timeout "$b" "$@" >>"$ERR" 2>&1
    rc=$?
    echo "[r5c] $label rc=$rc wall=$((($(date +%s)-t0)/60))min" | tee -a "$LOG"
    return $rc
}

run_hook() {
    [ -x scripts/r5_ab_hook.sh ] || return 0
    echo "[r5c] running A/B hook $(date -u +%H:%M:%S)" | tee -a "$LOG"
    bash scripts/r5_ab_hook.sh >>"$ERR" 2>&1
    echo "[r5c] A/B hook rc=$? done $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

# 0. device probe with retry (claims can linger after a process exits)
for i in $(seq 1 30); do
    if timeout 300 python - >>"$ERR" 2>&1 << 'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print(float((x @ x).sum()))
EOF
    then
        echo "[r5c] device probe OK (attempt $i)" | tee -a "$LOG"
        break
    fi
    echo "[r5c] device busy/wedged, retry $i $(date -u +%H:%M:%S)" | tee -a "$LOG"
    sleep 60
done

# 1. warm the combined flipped default + price the fixed bf16 knob first:
#    everything downstream (seeds, diag, MP3D) then rides the warm cache
run_hook

# 2. leftover scene-breadth seeds
for scene in room0 office3; do
    for seed in 0 500 1000; do
        out=results/seeds_r5/Replica/$scene/seed_$seed
        [ -f "$out/Replica/$scene/eval_result.txt" ] && continue
        run_gated 2700 "${scene}_seed_${seed}" python -m naruto_tpu.run \
            --dataset Replica --scene "$scene" --seed "$seed" \
            --sim raycast --scene_path "data/Replica/$scene/mesh.ply" \
            --result_dir "$out"
        tail -1 "$out/Replica/$scene/eval_result.txt" 2>/dev/null | tee -a "$LOG"
    done
    python -m naruto_tpu.utils.results \
        --scene-dir "results/seeds_r5/Replica/$scene" >>"$ERR" 2>&1 || true
done

# 3. seed_500 rescue diag (if r5b skipped it)
out=results/diag_seed500/Replica/office0
if [ ! -f "$out/Replica/office0/eval_result.txt" ]; then
    run_gated 2700 "seed500_diag" python -m naruto_tpu.run \
        --cfg configs/ab/office0_rescue.yaml --seed 500 \
        --sim raycast --scene_path data/Replica/office0/mesh.ply \
        --result_dir "$out"
    tail -1 "$out/Replica/office0/eval_result.txt" 2>/dev/null | tee -a "$LOG"
    PYTHONPATH=. python scripts/completion_gaps.py \
        --run "$out/Replica/office0" \
        > results/diag_seed500/completion_gaps.txt 2>>"$ERR" || true
fi

# 4. second MP3D-scale datapoint
out=results/mp3d_raycast_seed1/pLe4wQe7qrG
if [ ! -f "$out/MP3D/pLe4wQe7qrG/eval_result.txt" ]; then
    run_gated 5400 "mp3d_seed1" python -m naruto_tpu.run \
        --dataset MP3D --scene pLe4wQe7qrG --seed 1 \
        --sim raycast --scene_path data/MP3D/pLe4wQe7qrG/mesh.ply \
        --result_dir "$out"
    tail -1 "$out/MP3D/pLe4wQe7qrG/eval_result.txt" 2>/dev/null | tee -a "$LOG"
fi

run_hook

# 5. final re-warm: the driver bench must find the CURRENT default graphs
#    (parity + turbo) in .jax_cache — run unconditionally, no gate
echo "=== [r5c] bench_final start $(date -u +%H:%M:%S)" | tee -a "$LOG"
NARUTO_BENCH_TURBO=1 timeout 2400 python bench.py >>"$ERR" 2>&1
echo "[r5c] bench_final rc=$?" | tee -a "$LOG"

rm -f "$LOCK"
echo "[r5c] queue complete $(date -u)" | tee -a "$LOG"

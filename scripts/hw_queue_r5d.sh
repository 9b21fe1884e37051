#!/bin/bash
# Round-5 session-8 follow-on queue: runs after hw_queue_r5c.sh completes,
# in the window before the round-end driver bench. Every item is short
# (<=~25 min) and budget-gated so a driver bench that arrives mid-queue
# waits at most one item (< its 30-min device timeout).
# Value order:
#   1. scene BREADTH: 1 raycast seed on each never-run Replica scene
#      (office1/office2/office4/room1/room2) -> all 8 scenes validated
#   2. 5-seed DEPTH completion for room0/office3 (seeds 1500, 1999)
#   3. per-scene merges + cross-scene table
#   4. final no-op parity bench touch (leave the cache provably warm)
set -u
cd /root/repo
LOG=results/r5_queue.log
ERR=results/r5_queue.stderr
mkdir -p results
DEADLINE_EPOCH="${DEADLINE_EPOCH:-$(date -u -d '2026-08-20 12:45' +%s)}"
LOCK=/tmp/naruto_hw_queue.lock

# wait for r5c: either its "queue complete" line, or (it started AND its
# lock pid is gone — covers a crashed r5c). Never start before r5c has
# the lock, so the two waiters cannot race for r5b's release.
while true; do
    grep -q "\[r5c\] queue complete" "$LOG" 2>/dev/null && break
    if grep -q "\[r5c\] up" "$LOG" 2>/dev/null; then
        pid=$(cat "$LOCK" 2>/dev/null || true)
        { [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; } && break
    fi
    sleep 60
done
echo $$ > "$LOCK"
echo "[r5d] up $(date -u) deadline_epoch=$DEADLINE_EPOCH" | tee -a "$LOG"

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
        echo "[r5d] SKIP $label (budget ${b}s < ${need}s)" | tee -a "$LOG"
        return 1
    fi
    echo "=== [r5d] $label start $(date -u +%H:%M:%S) budget=${b}s" | tee -a "$LOG"
    local t0 rc
    t0=$(date +%s)
    timeout "$b" "$@" >>"$ERR" 2>&1
    rc=$?
    echo "[r5d] $label rc=$rc wall=$((($(date +%s)-t0)/60))min" | tee -a "$LOG"
    return $rc
}

# 0. device probe with retry (claims can linger after a process exits)
for i in $(seq 1 20); do
    if timeout 300 python - >>"$ERR" 2>&1 << 'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print(float((x @ x).sum()))
EOF
    then
        echo "[r5d] device probe OK (attempt $i)" | tee -a "$LOG"
        break
    fi
    echo "[r5d] device busy/wedged, retry $i $(date -u +%H:%M:%S)" | tee -a "$LOG"
    sleep 60
done

# 1. breadth: one raycast seed on each never-run Replica scene.
#    First seed of a new scene pays a per-scene-bounds compile (~room0
#    seed_0 was 19 min total), hence the 2400s gate.
for scene in office1 office2 office4 room1 room2; do
    out=results/seeds_r5/Replica/$scene/seed_0
    [ -f "$out/Replica/$scene/eval_result.txt" ] && continue
    run_gated 2400 "${scene}_seed_0" python -m naruto_tpu.run \
        --dataset Replica --scene "$scene" --seed 0 \
        --sim raycast --scene_path "data/Replica/$scene/mesh.ply" \
        --result_dir "$out"
    tail -1 "$out/Replica/$scene/eval_result.txt" 2>/dev/null | tee -a "$LOG"
done

# 2. depth: complete the reference 5-seed protocol on room0 + office3
#    (seeds 0/500/1000 ran in r5b/r5c; graphs warm, ~5-10 min each)
for scene in room0 office3; do
    for seed in 1500 1999; do
        out=results/seeds_r5/Replica/$scene/seed_$seed
        [ -f "$out/Replica/$scene/eval_result.txt" ] && continue
        run_gated 1500 "${scene}_seed_${seed}" python -m naruto_tpu.run \
            --dataset Replica --scene "$scene" --seed "$seed" \
            --sim raycast --scene_path "data/Replica/$scene/mesh.ply" \
            --result_dir "$out"
        tail -1 "$out/Replica/$scene/eval_result.txt" 2>/dev/null | tee -a "$LOG"
    done
done

# 3. re-merge every scene that has rows
for scene in room0 office3 office1 office2 office4 room1 room2; do
    d=results/seeds_r5/Replica/$scene
    [ -d "$d" ] && python -m naruto_tpu.utils.results --scene-dir "$d" \
        >>"$ERR" 2>&1 || true
done

# 4. final parity bench touch: a cache no-op (~2-3 min) that leaves the
#    flipped default graph provably warm for the driver bench
run_gated 600 "bench_touch" python bench.py

rm -f "$LOCK"
echo "[r5d] queue complete $(date -u)" | tee -a "$LOG"

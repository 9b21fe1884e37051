#!/bin/bash
# Round-5 session-7 device queue (relaunch: the 03:02 queue died with its
# parent session at step 432/2000 of hokage_room; no resumable ckpt).
# Cache state: parity+turbo bench graphs warm (03:02 bench_warm, 63.85),
# fresh BA trace taken (results/r5_trace_summary.txt). Reprioritized:
#   1. A/B hook (HLO dump + gather2 bound-diff pricing)  ~45 min
#   2. hokage_room NARUTO glb end-to-end                 ~3 h
#   3. room0/office3 x3 raycast seeds, budget-gated      ~20-30 min each
#   4. seed_500 diag rerun + MP3D seed 1 if budget remains
#   5. final bench re-warm (no-op unless a default flipped)
set -u
cd /root/repo
LOG=results/r5_queue.log
ERR=results/r5_queue.stderr
mkdir -p results
DEADLINE_EPOCH="${DEADLINE_EPOCH:-$(date -u -d '2026-08-20 09:45' +%s)}"
LOCK=/tmp/naruto_hw_queue.lock
echo $$ > "$LOCK"
echo "[r5b] up $(date -u) deadline_epoch=$DEADLINE_EPOCH" | tee -a "$LOG"

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
        echo "[r5b] SKIP $label (budget ${b}s < ${need}s)" | tee -a "$LOG"
        return 1
    fi
    echo "=== [r5b] $label start $(date -u +%H:%M:%S) budget=${b}s" | tee -a "$LOG"
    local t0 rc
    t0=$(date +%s)
    timeout "$b" "$@" >>"$ERR" 2>&1
    rc=$?
    echo "[r5b] $label rc=$rc wall=$((($(date +%s)-t0)/60))min" | tee -a "$LOG"
    return $rc
}

run_hook() {
    [ -x scripts/r5_ab_hook.sh ] || return 0
    echo "[r5b] running A/B hook $(date -u +%H:%M:%S)" | tee -a "$LOG"
    bash scripts/r5_ab_hook.sh >>"$ERR" 2>&1
    echo "[r5b] A/B hook rc=$? done $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

# 0. device probe: tiny matmul with timeout; retry until the claim frees
for i in $(seq 1 60); do
    if timeout 300 python - >>"$ERR" 2>&1 << 'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print(float((x @ x).sum()))
EOF
    then
        echo "[r5b] device probe OK (attempt $i)" | tee -a "$LOG"
        break
    fi
    echo "[r5b] device busy/wedged, retry $i $(date -u +%H:%M:%S)" | tee -a "$LOG"
    sleep 60
done

# 1. glue-gap A/Bs first (feeds a possible default flip; single-knob A/B
#    graphs double as the would-be default graphs, so flips stay warm)
run_hook

# 2. NARUTO glb end-to-end (all-three collision rule + gltf path)
out=results/naruto_glb/NARUTO/hokage_room/seed_0
if [ ! -f "$out/NARUTO/hokage_room/eval_result.txt" ]; then
    run_gated 12600 "hokage_room_glb" python -m naruto_tpu.run \
        --dataset NARUTO --scene hokage_room --seed 0 \
        --sim raycast --scene_path data/NARUTO/hokage_room/mesh.glb \
        --result_dir "$out"
    tail -1 "$out/NARUTO/hokage_room/eval_result.txt" 2>/dev/null | tee -a "$LOG"
fi

run_hook

# 3. scene breadth: room0 + office3, 3 raycast seeds each (parity default)
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

run_hook

# 4. seed_500 diagnostic rerun (rescue cfg) KEEPING mesh artifacts
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

# 5. second MP3D-scale datapoint (seed 1; r4 ran seed 0 only)
out=results/mp3d_raycast_seed1/pLe4wQe7qrG
if [ ! -f "$out/MP3D/pLe4wQe7qrG/eval_result.txt" ]; then
    run_gated 5400 "mp3d_seed1" python -m naruto_tpu.run \
        --dataset MP3D --scene pLe4wQe7qrG --seed 1 \
        --sim raycast --scene_path data/MP3D/pLe4wQe7qrG/mesh.ply \
        --result_dir "$out"
    tail -1 "$out/MP3D/pLe4wQe7qrG/eval_result.txt" 2>/dev/null | tee -a "$LOG"
fi

run_hook

# 6. final re-warm: make sure the CURRENT default graph is cached for the
#    driver bench (no-op if nothing flipped since the 03:02 bench)
run_gated 1200 "bench_final" python bench.py && tail -1 "$ERR" | tee -a "$LOG"

rm -f "$LOCK"
echo "[r5b] queue complete $(date -u)" | tee -a "$LOG"

#!/bin/bash
# Round-4h opportunistic device slot (session 5). Waits for
# hw_queue_r4g.sh, then fills the remaining wall-clock with rescue-config
# runs for the raycast seeds not yet measured under the composed
# mitigation (seed_1999 landed 99.30% in r4f, seed_500 runs in r4g):
# seeds 0 / 1000 / 1500. Together they complete a full 5-seed protocol
# table under configs/ab/office0_rescue.yaml, answering whether the
# attempt-charged goal_repeat_penalty + sim-probe override help, hurt,
# or are neutral on seeds that never livelocked. Healthy-seed runs take
# ~16-25 min each; every step is budget-gated against HARD_EXIT_UTC so
# the device claim frees before the round-end driver bench.
set -u
cd /root/repo
LOG=results/r4h_queue.log
mkdir -p results
HARD_EXIT_UTC="${HARD_EXIT_UTC:-13:55}"
echo "[r4h] up $(date -u) hard_exit=$HARD_EXIT_UTC" | tee -a "$LOG"

budget_s() {
    local now exit_t
    now=$(date -u +%s)
    exit_t=$(date -u -d "today $HARD_EXIT_UTC" +%s)
    echo $(( exit_t > now ? exit_t - now : 0 ))
}

# 0. wait for the r4g queue to exit (watch only — never kill by pattern)
for _ in $(seq 1 480); do
    pgrep -f hw_queue_r4g.sh >/dev/null || break
    sleep 30
done
echo "[r4h] r4g queue gone at $(date -u +%H:%M:%S)" | tee -a "$LOG"

for seed in 0 1000 1500; do
    b=$(budget_s)
    if [ "$b" -lt 1800 ]; then
        echo "[r4h] skip seed_$seed (budget ${b}s < 1800s)" | tee -a "$LOG"
        continue
    fi
    out=results/seeds_r4_rescue/Replica/office0/seed_$seed
    if [ -f "$out/Replica/office0/eval_result.txt" ]; then
        echo "[r4h] seed_$seed already done" | tee -a "$LOG"
        continue
    fi
    echo "=== rescue seed_$seed (budget ${b}s)" | tee -a "$LOG"
    t0=$(date +%s)
    timeout "$b" python -m naruto_tpu.run \
        --cfg configs/ab/office0_rescue.yaml --seed "$seed" \
        --sim raycast --scene_path data/Replica/office0/mesh.ply \
        --result_dir "$out" >>results/r4h_queue.stderr 2>&1
    rc=$?
    echo "[r4h] $(date -u +%H:%M:%S) seed_$seed rc=$rc wall=$((($(date +%s)-t0)/60))min" \
        | tee -a "$LOG"
    tail -1 "$out/Replica/office0/eval_result.txt" 2>/dev/null | tee -a "$LOG"
done
echo "[r4h] queue complete $(date -u)" | tee -a "$LOG"

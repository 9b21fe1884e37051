#!/bin/bash
# Round-4g opportunistic device slot (session 5). Waits for
# hw_queue_r4f.sh to release the single-client TPU claim, then — if
# there is still wall-clock before the round-end driver bench — runs
# ONE more exploration-mitigation data point: seed_500 (the weakest
# HEALTHY raycast seed: ratio 94.56%, traj 58.2 m, goal_repeat_max
# 9/41 plans) under the composed rescue config. Question answered:
# does the attempt-charged goal_repeat_penalty help (shorter, more
# decisive exploration) or at least not hurt a seed that is NOT
# livelocked? The run reuses the already-cached office0 BA executable
# and only holds the device claim while it runs; HARD_EXIT_UTC caps it
# so the claim is free well before the driver bench.
set -u
cd /root/repo
LOG=results/r4g_queue.log
mkdir -p results
START_DEADLINE_UTC="${START_DEADLINE_UTC:-12:55}"
HARD_EXIT_UTC="${HARD_EXIT_UTC:-13:55}"
echo "[r4g] up $(date -u) start_deadline=$START_DEADLINE_UTC hard_exit=$HARD_EXIT_UTC" | tee -a "$LOG"

# 0. wait for the r4f queue to exit (watch only — never kill by pattern)
for _ in $(seq 1 480); do
    pgrep -f hw_queue_r4f.sh >/dev/null || break
    sleep 30
done
echo "[r4g] r4f queue gone at $(date -u +%H:%M:%S)" | tee -a "$LOG"

if [ "$(date -u +%H:%M)" \> "$START_DEADLINE_UTC" ]; then
    echo "[r4g] past start deadline — yielding the device to the driver bench" \
        | tee -a "$LOG"
    exit 0
fi

# seconds until HARD_EXIT_UTC (today)
now_s=$(date -u +%s)
exit_s=$(date -u -d "today $HARD_EXIT_UTC" +%s)
budget=$((exit_s - now_s))
[ "$budget" -lt 600 ] && { echo "[r4g] <10 min budget — skip" | tee -a "$LOG"; exit 0; }

echo "=== seed_500 rescue A/B (healthy-seed regression check, budget ${budget}s)" \
    | tee -a "$LOG"
out=results/seeds_r4_rescue/Replica/office0/seed_500
t0=$(date +%s)
timeout "$budget" python -m naruto_tpu.run \
    --cfg configs/ab/office0_rescue.yaml --seed 500 \
    --sim raycast --scene_path data/Replica/office0/mesh.ply \
    --result_dir "$out" >>results/r4g_queue.stderr 2>&1
rc=$?
echo "[r4g] $(date -u +%H:%M:%S) seed_500 rescue rc=$rc wall=$((($(date +%s)-t0)/60))min" \
    | tee -a "$LOG"
tail -1 "$out/Replica/office0/eval_result.txt" 2>/dev/null | tee -a "$LOG"
python - <<'EOF' 2>/dev/null | tee -a "$LOG"
import json
p = ("results/seeds_r4_rescue/Replica/office0/seed_500/"
     "Replica/office0/planner_stats.json")
try:
    s = json.load(open(p))["summary"]
    print({k: s[k] for k in ("collisions", "collision_overrides",
                             "goal_repeat_max", "n_plans",
                             "uncert_mass_last") if k in s})
except FileNotFoundError:
    pass
EOF
echo "[r4g] queue complete $(date -u)" | tee -a "$LOG"

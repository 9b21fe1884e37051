#!/bin/bash
# Round-4g opportunistic device slot (session 5). Waits for
# hw_queue_r4f.sh to release the single-client TPU claim, then spends
# remaining wall-clock in priority order:
#   1+2. REGENERATE the turbo quality-pricing artifacts — the
#        fixed-trajectory parity and turbo A/B runs
#        (configs/ab/passive_traj_{ab,turbo}.yaml) whose eval rows back
#        the README/PERFORMANCE turbo-is-quality-neutral claim. The r4b
#        originals (results/ab_r4_{parity,turbo}_traj) were wiped with
#        the container and had never been committed; this time the eval
#        files are git-tracked (.gitignore already allows them).
#   3. seed_500 rescue A/B (healthy-seed regression check for the
#      attempt-charged goal_repeat_penalty) only if budget remains.
# HARD_EXIT_UTC caps every step so the device claim is free well before
# the round-end driver bench.
set -u
cd /root/repo
LOG=results/r4g_queue.log
mkdir -p results
HARD_EXIT_UTC="${HARD_EXIT_UTC:-13:55}"
echo "[r4g] up $(date -u) hard_exit=$HARD_EXIT_UTC" | tee -a "$LOG"

budget_s() {  # seconds until HARD_EXIT_UTC today (0 if past)
    local now exit_t
    now=$(date -u +%s)
    exit_t=$(date -u -d "today $HARD_EXIT_UTC" +%s)
    echo $(( exit_t > now ? exit_t - now : 0 ))
}

# 0. wait for the r4f queue to exit (watch only — never kill by pattern)
for _ in $(seq 1 480); do
    pgrep -f hw_queue_r4f.sh >/dev/null || break
    sleep 30
done
echo "[r4g] r4f queue gone at $(date -u +%H:%M:%S)" | tee -a "$LOG"

run_step() {  # label min_budget_s out_dir run-args...
    local label="$1" need="$2" out="$3"; shift 3
    local b t0 rc
    b=$(budget_s)
    if [ "$b" -lt "$need" ]; then
        echo "[r4g] skip $label (budget ${b}s < ${need}s)" | tee -a "$LOG"
        return 1
    fi
    echo "=== $label (budget ${b}s)" | tee -a "$LOG"
    t0=$(date +%s)
    timeout "$b" python -m naruto_tpu.run "$@" \
        --result_dir "$out" >>results/r4g_queue.stderr 2>&1
    rc=$?
    echo "[r4g] $(date -u +%H:%M:%S) $label rc=$rc wall=$((($(date +%s)-t0)/60))min" \
        | tee -a "$LOG"
    tail -1 "$out"/Replica/office0/eval_result.txt 2>/dev/null | tee -a "$LOG"
}

# 1. parity row of the fixed-trajectory protocol (~15-25 min warm)
run_step "1. passive traj A/B: r4 parity default" 1500 \
    results/ab_r4_parity_traj \
    --cfg configs/ab/passive_traj_ab.yaml --seed 0

# 2. turbo row on the identical trajectory
run_step "2. passive traj A/B: turbo" 1500 \
    results/ab_r4_turbo_traj \
    --cfg configs/ab/passive_traj_turbo.yaml --seed 0

# 3. seed_500 composed-rescue regression check (~45-60 min)
if run_step "3. seed_500 rescue A/B (healthy-seed regression check)" 2700 \
    results/seeds_r4_rescue/Replica/office0/seed_500 \
    --cfg configs/ab/office0_rescue.yaml --seed 500 \
    --sim raycast --scene_path data/Replica/office0/mesh.ply; then
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
fi
echo "[r4g] queue complete $(date -u)" | tee -a "$LOG"

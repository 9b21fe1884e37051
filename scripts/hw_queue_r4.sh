#!/bin/bash
# Round-4 hardware-measurement queue: re-measures the round-3 A/B table,
# whose "default" base row (16.2 it/s) disagreed 2.7x with the driver
# bench of the same graph (43.06) and therefore inverted every
# recommendation (VERDICT.md r3 weak#2).
#
# Changes vs r3:
#   * the default graph is benched FIRST and LAST (bracket) — the
#     analyzer rejects the whole log if the bracket disagrees >20%;
#   * step failures are detected via PIPESTATUS (not tee's rc) and the
#     queue aborts if the opening default bench produced no valid row —
#     every later delta would be computed against the wrong base;
#   * longer measurement window (NARUTO_BENCH_STEPS=60, ~3x r3) to cut
#     per-row variance through the tunnel.
#
# All 7 graphs were compiled by the r3 queue and live in .jax_cache, so
# each step should be minutes, not the 45-min cold ceiling.
#
# The axon TPU service is SINGLE-CLIENT: do not run anything else that
# touches the TPU while this is going. CPU-forced pytest is fine.
set -u
cd /root/repo
LOG=results/r4_hw_queue.log
mkdir -p results

step() {
    local label="$1"; shift
    echo "=== $label" | tee -a "$LOG"
    echo "[hw_queue] $(date -u +%H:%M:%S) start: $label" >&2
    # 45 min per step: covers a full cold remote compile + measurement.
    timeout 2700 env NARUTO_BENCH_STEPS=60 "$@" python bench.py \
        2>>results/r4_hw_queue.stderr | tee -a "$LOG"
    local rc=${PIPESTATUS[0]}
    echo "[hw_queue] $(date -u +%H:%M:%S) done: $label (rc=$rc)" >&2
}

step "1. default bracket-open (batched sort)" NARUTO_DUMMY=0
# Abort if the opening default produced no valid JSON row: the analyzer
# would otherwise base every A/B delta on whichever row came first
# (ADVICE r3 medium). grep -c: rows are one-line JSON with "metric".
if ! grep -q '"metric"' "$LOG" || \
   python - "$LOG" <<'EOF'
import json, sys
ok = False
for line in open(sys.argv[1]):
    line = line.strip()
    if line.startswith("{") and '"metric"' in line:
        rec = json.loads(line)
        if "error" not in rec and rec.get("value"):
            ok = True
sys.exit(0 if not ok else 1)  # exit 0 == "no valid row" -> abort
EOF
then
    echo "[hw_queue] ABORT: opening default bench produced no valid row" \
        | tee -a "$LOG" >&2
    exit 1
fi

step "2. flat_sort A/B" NARUTO_FLAT_SORT=1
step "3. frac-carry A/B" NARUTO_BENCH_CFG='{"grid": {"sort_carry": "frac"}}'
step "4. only outer_cumsum off" NARUTO_NO_PALLAS_CUMSUM=1
step "5. only fused_adam off" NARUTO_NO_PALLAS_ADAM=1
step "6. approx_topk A/B" NARUTO_BENCH_CFG='{"mapper": {"approx_topk": true}}'
step "7. default bracket-close (batched sort)" NARUTO_DUMMY=0
echo "=== queue complete $(date -u)" | tee -a "$LOG"
python scripts/analyze_hw_queue.py "$LOG" | tee -a "$LOG"

#!/bin/bash
# Round-3 hardware-measurement queue (reconstruction of the session-2
# /tmp/post_protocol.sh, which was lost to the container restart that also
# wiped .jax_cache). Runs the single-knob A/B benches on the real TPU and
# tees into results/r3_hw_queue.log for scripts/analyze_hw_queue.py.
#
# Order matters: the DEFAULT-config bench runs first so the persistent
# compile cache (.jax_cache) is warm with the exact graph the driver's
# end-of-round bench.py will compile. Each subsequent step flips exactly
# one knob, so a default flip keeps the cache warm (the A/B graph IS the
# would-be default graph).
#
# The axon TPU service is SINGLE-CLIENT: do not run anything else that
# touches the TPU while this is going. CPU-forced pytest is fine.
set -u
cd /root/repo
LOG=results/r3_hw_queue.log
mkdir -p results

step() {
    local label="$1"; shift
    echo "=== $label" | tee -a "$LOG"
    echo "[hw_queue] $(date -u +%H:%M:%S) start: $label" >&2
    # 45 min per step: covers a full cold remote compile + measurement.
    timeout 2700 env "$@" python bench.py 2>>results/r3_hw_queue.stderr \
        | tee -a "$LOG"
    echo "[hw_queue] $(date -u +%H:%M:%S) done: $label (rc=$?)" >&2
}

step "1. default (batched sort, warms driver cache)" NARUTO_DUMMY=0
step "2. flat_sort A/B" NARUTO_FLAT_SORT=1
step "3. frac-carry A/B" NARUTO_BENCH_CFG='{"grid": {"sort_carry": "frac"}}'
step "4. only outer_cumsum off" NARUTO_NO_PALLAS_CUMSUM=1
step "5. only fused_adam off" NARUTO_NO_PALLAS_ADAM=1
step "6. approx_topk A/B" NARUTO_BENCH_CFG='{"mapper": {"approx_topk": true}}'
echo "=== queue complete $(date -u)" | tee -a "$LOG"
python scripts/analyze_hw_queue.py "$LOG" | tee -a "$LOG"

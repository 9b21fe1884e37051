#!/bin/bash
# Idempotent device-claim hook (invoked by hw_queue_r5.sh at step
# boundaries). Stage 1: dump the BA executable's optimized HLO so trace op
# names (pad.1137, copy.836, ...) resolve to instructions + metadata.
set -u
cd /root/repo
if [ ! -f results/r5_hlo_dump.done ]; then
    timeout 1200 python scripts/dump_ba_hlo.py \
        > results/r5_ba_hlo.txt 2>results/r5_hlo_dump.err \
        && touch results/r5_hlo_dump.done \
        && echo "[hook] HLO dumped: $(wc -l < results/r5_ba_hlo.txt) lines"
fi

# Stage 2: bracketed A/B of the segment-sum tail's boundary diff
# (NARUTO_BOUND_DIFF=gather2, commit 410ca80) against the r5 trace's
# pad.1137/1138 + copy.836 cost (~1.4 ms/iter total). Protocol per
# PERFORMANCE.md: default bracket, knob, default bracket — parity graph
# only (turbo row skipped: the knob acts on the same segment-sum tail in
# both presets, one pricing suffices).
AB=results/r5_ab_bound_diff.log
if [ ! -f results/r5_ab_bound_diff.done ]; then
    {
        echo "=== bracket_open $(date -u +%H:%M:%S)"
        NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
        echo "=== gather2 $(date -u +%H:%M:%S)"
        NARUTO_BOUND_DIFF=gather2 NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
        echo "=== bracket_close $(date -u +%H:%M:%S)"
        NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
    } >>"$AB" 2>&1 && touch results/r5_ab_bound_diff.done \
        && echo "[hook] bound-diff A/B done -> $AB"
fi

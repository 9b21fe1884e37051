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

# Stage 3 (session 7): three glue knobs from the resolved r5 trace+HLO,
# priced solo in ONE bracket (gather2 measured -3.3% -> stays off):
#   A NARUTO_DENSE_BF16_CONV  — bf16-cast the dense vertex grid BEFORE the
#     one-hot corner conv (bit-identical; kills convert_reduce_fusion.22,
#     0.93 ms/iter)
#   B NARUTO_PRESORT_PAD      — fold the Pallas cumsum 512-alignment into
#     the pre-sort level-major concats (kills pad.1137/1138, 0.77 ms/iter)
#   C NARUTO_SORTED_UNPACK=cols — column-wise sorted-payload reassembly
#     (targets ConcatBitcast+copy.836+fusion.586, ~0.95 ms/iter)
AB3=results/r5_ab_glue.log
if [ -f results/r5_ab_bound_diff.done ] && [ ! -f results/r5_ab_glue.done ]; then
    {
        echo "=== bracket_open $(date -u +%H:%M:%S)"
        NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
        echo "=== dense_bf16_conv $(date -u +%H:%M:%S)"
        NARUTO_DENSE_BF16_CONV=1 NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
        echo "=== presort_pad $(date -u +%H:%M:%S)"
        NARUTO_PRESORT_PAD=1 NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
        echo "=== sorted_unpack_cols $(date -u +%H:%M:%S)"
        NARUTO_SORTED_UNPACK=cols NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
        echo "=== bracket_close $(date -u +%H:%M:%S)"
        NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
    } >>"$AB3" 2>&1 && touch results/r5_ab_glue.done \
        && echo "[hook] glue A/B done -> $AB3"
fi

# Stage 4: once defaults are flipped from the stage-3 measurements (the
# flip drops a marker), warm the COMBINED default graph for the driver
# bench (a multi-knob flip is a new graph; single-knob flips are already
# warm from their A/B run).
if [ -f results/r5_flip.done ] && [ ! -f results/r5_flip_warm.done ]; then
    # NARUTO_BENCH_TURBO=1 forces the turbo row too: post-flip the turbo
    # graph is also new, and the driver bench must find BOTH warm
    NARUTO_BENCH_TURBO=1 timeout 3600 python bench.py \
        > results/r5_flip_warm.log 2>&1 \
        && touch results/r5_flip_warm.done \
        && echo "[hook] flipped-default warm bench done"
fi

# Stage 5: re-price the dense-grid bf16 conv knob (the stage-3 run was a
# no-op: gather_dtype is a string and the guard compared it to the jnp
# type — fixed post-A/B). Priced against the COMBINED flipped default
# (presort_pad + unpack cols), which stage 4 has already warmed.
AB5=results/r5_ab_bf16.log
if [ -f results/r5_flip_warm.done ] && [ ! -f results/r5_ab_bf16.done ]; then
    {
        echo "=== bracket_open $(date -u +%H:%M:%S)"
        NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
        echo "=== dense_bf16_conv $(date -u +%H:%M:%S)"
        NARUTO_DENSE_BF16_CONV=1 NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
        echo "=== bracket_close $(date -u +%H:%M:%S)"
        NARUTO_BENCH_TURBO=0 timeout 2400 python bench.py
    } >>"$AB5" 2>&1 && touch results/r5_ab_bf16.done \
        && echo "[hook] bf16-conv A/B done -> $AB5"
fi

# Stage 6: fresh steady-state trace of the FLIPPED default graph — names
# whatever glue remains after presort_pad + unpack-cols (guides round 6).
if [ -f results/r5_flip_warm.done ] && [ ! -f results/r5_trace2.done ]; then
    timeout 1200 python scripts/profile_ba.py --trace-dir /tmp/ba_trace_r5b \
        >/dev/null 2>&1 \
    && timeout 300 python scripts/trace_summary.py /tmp/ba_trace_r5b \
        > results/r5_trace2_summary.txt 2>&1 \
    && touch results/r5_trace2.done \
    && echo "[hook] post-flip trace -> results/r5_trace2_summary.txt"
fi

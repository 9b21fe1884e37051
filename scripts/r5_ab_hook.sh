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

#!/bin/bash
# Round-4 raycast-seed runner: completes the reference 5-seed protocol
# through the C++ BVH raycast backend (seed 0 recorded in r3 at 98.74%
# ratio; seeds 500/1000/1500/1999 remaining — VERDICT r3 item 4).
#
# Seeds run the r4 parity default (flat sort + frac carry + pad+sum);
# seed 0 predates those flips — the fixed-trajectory A/B
# (results/ab_r4_default vs the r3 table) prices the config delta at the
# noise level, and exploration variance (±1.7% ratio across seeds)
# dominates either way. Run AFTER the TPU is free (single-client claim).
set -u
cd /root/repo
LOG=results/r4_seeds.log
mkdir -p results
exec >>"$LOG" 2>&1
echo "[seeds-r4] up $(date -u)"

MESH=data/Replica/office0/mesh.ply
if [ ! -f "$MESH" ]; then
    echo "[seeds-r4] regenerating office0 assets"
    python scripts/make_office0_assets.py || { echo "no mesh"; exit 1; }
fi

for seed in 500 1000 1500 1999; do
    out=results/seeds_r3_raycast/Replica/office0/seed_$seed
    if [ -f "$out/Replica/office0/eval_result.txt" ]; then
        echo "[seeds-r4] seed $seed already recorded"; continue
    fi
    echo "[seeds-r4] $(date -u +%H:%M:%S) start seed $seed"
    timeout 7200 python -m naruto_tpu.run \
        --dataset Replica --scene office0 --seed "$seed" \
        --result_dir "$out" --sim raycast --scene_path "$MESH"
    echo "[seeds-r4] $(date -u +%H:%M:%S) seed $seed rc=$?"
done

python -m naruto_tpu.utils.results \
    --scene-dir results/seeds_r3_raycast/Replica/office0
echo "[seeds-r4] done $(date -u)"

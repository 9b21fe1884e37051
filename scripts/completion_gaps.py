"""Localize completion gaps: WHERE is the unreconstructed ground truth?

Diagnostic for weak seeds (VERDICT r4 next-step #5, seed_500): the eval row
says completion ratio X%, this tool says WHICH regions make up the missing
(100-X)% — gt surface samples farther than the ratio threshold (5 cm, same
as evaluation/recon.py) from the reconstruction, clustered by connected
voxel components, with centroids reported in world AND planner-voxel
coordinates so the clusters can be read against planner_stats.json goals.

Usage:
  PYTHONPATH=. python scripts/completion_gaps.py \
      --run results/seeds_r4_rescue/Replica/office0/seed_500/Replica/office0 \
      [--gt <gt_mesh.ply>] [--thresh 0.05] [--voxel 0.2] [--cull]

The recon mesh is auto-detected (mesh_*_final.ply) and culled the same way
the eval culls (frustum/occlusion culling needs the traj; default off —
raw mesh vs gt still localizes gaps correctly because gaps are measured
from the GT side).
"""
from __future__ import annotations

import argparse
import glob
import os


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True,
                   help="run dir containing gt_mesh.ply + mesh_*_final.ply")
    p.add_argument("--gt", default=None)
    p.add_argument("--rec", default=None)
    p.add_argument("--thresh", type=float, default=0.05,
                   help="gap threshold in meters (eval ratio uses 0.05)")
    p.add_argument("--voxel", type=float, default=0.2,
                   help="clustering voxel + planner voxel size")
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--top", type=int, default=10)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from naruto_tpu.evaluation.recon import (nearest_distances,
                                             sample_surface_points)
    from naruto_tpu.mesh.ply import read_ply

    gt_path = args.gt or os.path.join(args.run, "gt_mesh.ply")
    rec_path = args.rec
    if rec_path is None:
        cands = sorted(glob.glob(os.path.join(args.run, "mesh_*_final.ply")))
        if not cands:
            cands = sorted(glob.glob(os.path.join(args.run, "mesh",
                                                  "mesh_*.ply")))
        if not cands:
            raise SystemExit(f"no recon mesh under {args.run}")
        rec_path = cands[-1]
    gv, gf, _ = read_ply(gt_path)
    rv, rf, _ = read_ply(rec_path)
    print(f"gt: {gt_path} ({len(gv)} v), recon: {rec_path} ({len(rv)} v)")

    rng = np.random.default_rng(0)
    gt_pts = sample_surface_points(gv, gf, args.n, rng)
    rec_pts = sample_surface_points(rv, rf, args.n, rng)
    d = nearest_distances(gt_pts, rec_pts)
    gap = gt_pts[d > args.thresh]
    ratio = 100.0 * (1.0 - len(gap) / len(gt_pts))
    print(f"completion ratio @{args.thresh * 100:.0f}cm: {ratio:.2f}%  "
          f"({len(gap)} gap samples)")
    if not len(gap):
        return

    # cluster gap samples by connected voxel components (6-connectivity)
    lo = gt_pts.min(axis=0)
    vx = np.floor((gap - lo) / args.voxel).astype(np.int64)
    keys, inv = np.unique(vx, axis=0, return_inverse=True)
    # union-find over occupied voxels
    parent = np.arange(len(keys))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    index = {tuple(k): i for i, k in enumerate(keys)}
    for i, k in enumerate(keys):
        for ax in range(3):
            for s in (-1, 1):
                nb = list(k)
                nb[ax] += s
                j = index.get(tuple(nb))
                if j is not None:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[ri] = rj
    roots = np.array([find(i) for i in range(len(keys))])
    comp_of_sample = roots[inv]
    comps, counts = np.unique(comp_of_sample, return_counts=True)
    order = np.argsort(-counts)
    print(f"{len(comps)} gap clusters; top {min(args.top, len(comps))} "
          f"(pct = share of ALL gt samples):")
    for ci in order[:args.top]:
        pts = gap[comp_of_sample == comps[ci]]
        c = pts.mean(axis=0)
        vox = np.floor((c - lo) / args.voxel).astype(int)
        ext = pts.max(axis=0) - pts.min(axis=0)
        print(f"  {counts[ci]:7d} samples ({100.0 * counts[ci] / len(gt_pts):5.2f}%)"
              f"  centroid {np.round(c, 2).tolist()}"
              f"  vox {vox.tolist()}  extent {np.round(ext, 2).tolist()}"
              f"  mean_d {100 * d[d > args.thresh][comp_of_sample == comps[ci]].mean():.1f}cm")


if __name__ == "__main__":
    main()

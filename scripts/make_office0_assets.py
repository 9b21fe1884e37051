"""Regenerate the office0 raycast-backend assets under data/Replica/office0.

The environment ships no real Replica meshes, so the raycast-simulator
protocol runs (scripts/run_replica.sh ... raycast data/Replica) are served
from the ANALYTIC office0 scene's exact ground-truth mesh: marching cubes
over the analytic SDF at the eval voxel size, vertex-colored by the
analytic albedo — the same export the engine performs at finalize
(system/engine.py gt_mesh path). ~7 MB, deterministic; kept out of git.

Run: PYTHONPATH=. python scripts/make_office0_assets.py
"""
from __future__ import annotations

import os

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from naruto_tpu.config import make_config
    from naruto_tpu.mesh.marching import marching_cubes
    from naruto_tpu.mesh.ply import write_ply
    from naruto_tpu.sim import init_simulator

    cfg = make_config("Replica", "office0")
    sim = init_simulator(cfg)          # analytic backend (default)
    vs = cfg.mesh.voxel_eval
    gt_sdf = sim.gt_occupancy_volume(vs)
    v_vox, f = marching_cubes(gt_sdf, truncation=1e9)
    bound = cfg.mapper.bound_np
    verts = v_vox * vs + bound[:, 0]
    # vertex colors from the analytic procedural color field, so the
    # raycast backend exercises real RGB supervision (a colorless PLY
    # falls back to a constant albedo in sim/raycast.py)
    colors = (np.clip(np.asarray(sim.color_fn(verts)), 0.0, 1.0)
              * 255).astype(np.uint8)
    out = "data/Replica/office0"
    os.makedirs(out, exist_ok=True)
    write_ply(os.path.join(out, "mesh.ply"), verts, f, colors=colors)
    print(f"wrote {out}/mesh.ply: {len(verts)} verts, {len(f)} faces")


if __name__ == "__main__":
    main()

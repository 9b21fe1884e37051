"""Generate raycast-backend mesh assets for ANY analytic scene.

Generalizes scripts/make_office0_assets.py (office0-only) to every
configured scene: marching cubes over the scene's analytic SDF at a
chosen voxel size, vertex-colored by the analytic albedo, written as
data/<dataset>/<scene>/mesh.ply for `--sim raycast --scene_path ...`.

The MP3D-scale validation (VERDICT r4 item 7) uses the largest scene:

    PYTHONPATH=. python scripts/make_scene_assets.py \
        --dataset MP3D --scene pLe4wQe7qrG --voxel 0.04

(11.5 x 7.5 x 11 m bounds -> 978k planner voxels; voxel 0.04 keeps the
occupancy volume ~15M cells so the single-core marching cubes stays in
budget — the mesh serves SENSING, the eval still scores against the
exact analytic ground truth.)
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Replica")
    p.add_argument("--scene", default="office0")
    p.add_argument("--voxel", type=float, default=None,
                   help="marching-cubes voxel (default: cfg.mesh.voxel_eval)")
    p.add_argument("--format", choices=("ply", "glb"), default="ply",
                   help="glb packages the mesh for the gltf->raycaster "
                        "path (NARUTO-dataset scenes ship as .glb in the "
                        "reference habitat pipeline)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from naruto_tpu.config import make_config
    from naruto_tpu.mesh.marching import marching_cubes
    from naruto_tpu.mesh.ply import write_ply
    from naruto_tpu.sim import init_simulator

    cfg = make_config(args.dataset, args.scene)
    sim = init_simulator(cfg)          # analytic backend (default)
    vs = args.voxel or cfg.mesh.voxel_eval
    gt_sdf = sim.gt_occupancy_volume(vs)
    v_vox, f = marching_cubes(gt_sdf, truncation=1e9)
    bound = cfg.mapper.bound_np
    verts = v_vox * vs + bound[:, 0]
    colors = (np.clip(np.asarray(sim.color_fn(verts)), 0.0, 1.0)
              * 255).astype(np.uint8)
    out = os.path.join("data", args.dataset, args.scene)
    os.makedirs(out, exist_ok=True)
    if args.format == "glb":
        from naruto_tpu.mesh.gltf import write_glb

        write_glb(os.path.join(out, "mesh.glb"), verts, f,
                  colors=colors.astype(np.float32) / 255.0)
    else:
        write_ply(os.path.join(out, "mesh.ply"), verts, f, colors=colors)
    print(f"wrote {out}/mesh.{args.format}: {len(verts)} verts, "
          f"{len(f)} faces")


if __name__ == "__main__":
    main()

"""Offline visualization tools (replay of saved artifacts).

Role parity with the reference's offline visualizers (src/visualization/
naruto_o3d_visualizer.py, vis_traj.py, vis_mesh_evo.py,
naruto_video_maker.py — C30o in SURVEY.md). Open3D is unavailable in this
environment, so rendering uses matplotlib (trajectory/mesh stills) and
OpenCV (video tiling) over the same artifact directory contract written by
ArtifactSaver.

CLI:
    python -m naruto_tpu.visualization.offline traj --run <dir> --out t.png
    python -m naruto_tpu.visualization.offline mesh_evo --run <dir> --out d/
    python -m naruto_tpu.visualization.offline video --run <dir> --out v.mp4
"""
from __future__ import annotations

import argparse
import glob
import os
from typing import List, Optional

import numpy as np


def _load_poses(run_dir: str) -> List[np.ndarray]:
    files = sorted(glob.glob(os.path.join(run_dir, "pose", "*.npy")))
    return [np.load(f) for f in files]


def plot_trajectory(run_dir: str, out_path: str) -> None:
    """Top-down + 3D trajectory plot from saved per-step poses."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses = _load_poses(run_dir)
    if not poses:
        raise FileNotFoundError(f"no poses under {run_dir}/pose")
    t = np.stack([p[:3, 3] for p in poses])
    fig = plt.figure(figsize=(10, 5))
    ax = fig.add_subplot(121)
    ax.plot(t[:, 0], t[:, 1], "-", lw=1)
    ax.scatter(t[0, 0], t[0, 1], c="g", label="start")
    ax.scatter(t[-1, 0], t[-1, 1], c="r", label="end")
    ax.set_aspect("equal")
    ax.set_title("top-down (x, y)")
    ax.legend()
    ax3 = fig.add_subplot(122, projection="3d")
    ax3.plot(t[:, 0], t[:, 1], t[:, 2], lw=1)
    ax3.set_title("3D trajectory")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def render_mesh_still(ply_path: str, out_path: str,
                      max_faces: int = 60000) -> None:
    """Render one mesh snapshot with matplotlib trisurf."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from naruto_tpu.mesh.ply import read_ply

    verts, faces, colors = read_ply(ply_path)
    if len(faces) > max_faces:
        sel = np.random.default_rng(0).choice(len(faces), max_faces,
                                              replace=False)
        faces = faces[sel]
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot_trisurf(verts[:, 0], verts[:, 1], faces, verts[:, 2],
                    linewidth=0, antialiased=False, alpha=0.9)
    ax.set_title(os.path.basename(ply_path))
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def mesh_evolution(run_dir: str, out_dir: str,
                   kind: str = "color_mesh") -> List[str]:
    """Render every periodic mesh snapshot to a png (vis_mesh_evo parity)."""
    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for ply in sorted(glob.glob(os.path.join(run_dir, kind, "*.ply"))):
        out = os.path.join(
            out_dir, os.path.basename(ply).replace(".ply", ".png"))
        render_mesh_still(ply, out)
        outs.append(out)
    return outs


def make_video(run_dir: str, out_path: str, fps: int = 10,
               mesh_stills_dir: Optional[str] = None) -> None:
    """Tile per-step rgbd panels (optionally side-by-side with the latest
    mesh-evolution still) into an mp4 (naruto_video_maker parity)."""
    import cv2

    frames = sorted(glob.glob(os.path.join(run_dir, "rgbd", "*.png")))
    if not frames:
        raise FileNotFoundError(f"no rgbd frames under {run_dir}/rgbd")
    stills = (sorted(glob.glob(os.path.join(mesh_stills_dir, "*.png")))
              if mesh_stills_dir else [])
    first = cv2.imread(frames[0])
    h, w = first.shape[:2]
    out_w = w + (h if stills else 0)
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (out_w, h))
    si = 0
    for i, f in enumerate(frames):
        img = cv2.imread(f)
        if img is None or img.shape[:2] != (h, w):
            continue
        if stills:
            # advance to the newest mesh still at or before this frame
            while si + 1 < len(stills) and \
                    os.path.basename(stills[si + 1]) <= os.path.basename(f):
                si += 1
            mesh_img = cv2.imread(stills[si])
            mesh_img = cv2.resize(mesh_img, (h, h))
            img = np.concatenate([img, mesh_img], axis=1)
        vw.write(img)
    vw.release()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["traj", "mesh_evo", "video"])
    p.add_argument("--run", required=True,
                   help="run visualization dir (containing pose/, rgbd/ ...)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if args.mode == "traj":
        plot_trajectory(args.run, args.out)
    elif args.mode == "mesh_evo":
        mesh_evolution(args.run, args.out)
    else:
        make_video(args.run, args.out)


if __name__ == "__main__":
    main()

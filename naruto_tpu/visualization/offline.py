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
                      H: int = 480, W: int = 480) -> None:
    """Render one mesh snapshot through the C++ raycaster (vertex-colored,
    hidden-surface correct, fast on 100k+ triangle meshes)."""
    import cv2

    r = _MeshRenderer(ply_path)
    lo, hi = r.bounds
    center = (lo + hi) / 2.0
    diag = float(np.linalg.norm(hi - lo))
    eye = center + np.asarray([0.9, -0.9, 0.8], np.float32) * diag * 0.75
    color, _ = r.render(_lookat_c2w(eye, center), H, W, 0.9 * W / 2.0)
    r.close()
    img = np.ascontiguousarray(
        (np.clip(color, 0, 1) * 255).astype(np.uint8)[..., ::-1])
    cv2.putText(img, os.path.basename(ply_path), (8, 20),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1,
                cv2.LINE_AA)
    cv2.imwrite(out_path, img)


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


# --------------------------------------------------------------- 3D replay
class _MeshRenderer:
    """Offline mesh renderer on the C++ BVH raycaster (no Open3D in this
    environment; hidden surfaces are handled by raycasting and the line
    overlays are depth-tested against the rendered depth map)."""

    def __init__(self, ply_path: str):
        import ctypes

        from naruto_tpu.mesh.ply import read_ply
        from naruto_tpu.sim.raycast import _fp, _load_lib

        self._lib = _load_lib()
        self._fp = _fp
        verts, faces, colors = read_ply(ply_path)
        verts = np.ascontiguousarray(verts, dtype=np.float32)
        faces = np.ascontiguousarray(faces, dtype=np.int32)
        col_ptr = None
        if colors is not None:
            colors = np.ascontiguousarray(
                colors.astype(np.float32) / 255.0)
            col_ptr = _fp(colors)
        self._handle = self._lib.rc_create(
            _fp(verts), len(verts), col_ptr,
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(faces))
        self._keep = (verts, faces, colors)
        self.bounds = (verts.min(axis=0), verts.max(axis=0))

    def render(self, c2w: np.ndarray, H: int, W: int, f: float):
        pose = np.ascontiguousarray(c2w.astype(np.float32)).reshape(16)
        color = np.empty((H, W, 3), dtype=np.float32)
        depth = np.empty((H, W), dtype=np.float32)
        import ctypes

        self._lib.rc_render_pinhole(
            self._handle, self._fp(pose), H, W,
            ctypes.c_float(f), ctypes.c_float(f),
            ctypes.c_float((W - 1) / 2.0), ctypes.c_float((H - 1) / 2.0),
            self._fp(color), self._fp(depth))
        return color, depth

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.rc_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()


def _lookat_c2w(eye: np.ndarray, target: np.ndarray,
                up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """RDF camera-to-world looking from eye at target."""
    fwd = target - eye
    fwd = fwd / max(np.linalg.norm(fwd), 1e-9)
    up = np.asarray(up, np.float32)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, np.asarray([0.0, 1.0, 0.0], np.float32))
    right = right / max(np.linalg.norm(right), 1e-9)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w


def _project(pts: np.ndarray, c2w: np.ndarray, f: float, H: int, W: int):
    """World points [N,3] -> (uv [N,2] float, z [N]) in the view camera."""
    w2c_r = c2w[:3, :3].T
    x = (pts - c2w[:3, 3]) @ w2c_r.T
    z = x[:, 2]
    zs = np.maximum(z, 1e-6)
    u = x[:, 0] / zs * f + (W - 1) / 2.0
    v = x[:, 1] / zs * f + (H - 1) / 2.0
    return np.stack([u, v], axis=-1), z


def _draw_segment(img, depth, a3, b3, c2w, f, color, occl_eps=0.05,
                  n_samples=48):
    """Depth-tested 3D line segment drawn into img [H,W,3] uint8."""
    import cv2

    H, W = depth.shape
    ts = np.linspace(0.0, 1.0, n_samples)
    pts = a3[None] * (1 - ts[:, None]) + b3[None] * ts[:, None]
    uv, z = _project(pts, c2w, f, H, W)
    prev = None
    for (u, v), zz in zip(uv, z):
        ok = (zz > 1e-3 and 0 <= u < W and 0 <= v < H)
        if ok:
            d = depth[int(v), int(u)]
            ok = d <= 0 or zz <= d + occl_eps
        cur = (int(u), int(v)) if ok else None
        if prev is not None and cur is not None:
            cv2.line(img, prev, cur, color, 1, cv2.LINE_AA)
        prev = cur


def _frustum_lines(c2w: np.ndarray, scale: float = 0.2,
                   aspect: float = 680.0 / 1200.0, fov_x: float = 0.785):
    """Camera frustum wireframe segments (apex + 4 image corners)."""
    hw = np.tan(fov_x) * scale
    hh = hw * aspect
    corners_cam = np.array([[-hw, -hh, scale], [hw, -hh, scale],
                            [hw, hh, scale], [-hw, hh, scale]], np.float32)
    corners = corners_cam @ c2w[:3, :3].T + c2w[:3, 3]
    apex = c2w[:3, 3]
    segs = [(apex, c) for c in corners]
    segs += [(corners[i], corners[(i + 1) % 4]) for i in range(4)]
    return segs


def replay(run_dir: str, out_dir: str, H: int = 480, W: int = 640,
           stride: int = 1, view: Optional[str] = None,
           video_path: Optional[str] = None) -> List[str]:
    """Replay the saved run artifacts into rendered 3D scene frames —
    parity with the reference's Open3D replay (naruto_o3d_visualizer.py:
    146-268): the latest periodic mesh + the agent's camera frustum +
    trajectory so far + planning path + look-at target lines, rendered
    from a fixed overview camera. Writes pngs (and optionally an mp4)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    poses = sorted(glob.glob(os.path.join(run_dir, "pose", "*.npy")))
    meshes = sorted(glob.glob(os.path.join(run_dir, "color_mesh", "*.ply")))
    if not poses:
        raise FileNotFoundError(f"no poses under {run_dir}/pose")
    if not meshes:
        raise FileNotFoundError(f"no meshes under {run_dir}/color_mesh")

    def step_of(path):
        import re

        m = re.search(r"(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else 0

    mesh_steps = [step_of(m) for m in meshes]

    # overview camera from the first mesh's bounds
    renderer = _MeshRenderer(meshes[0])
    lo, hi = renderer.bounds
    center = (lo + hi) / 2.0
    diag = float(np.linalg.norm(hi - lo))
    eye = center + np.asarray([0.9, -0.9, 0.8], np.float32) * diag * 0.75
    view_c2w = _lookat_c2w(eye, center)
    f = 0.9 * W / 2.0

    traj = []
    outs = []
    cur_mesh_idx = 0
    for pose_path in poses[::stride]:
        step = step_of(pose_path)
        c2w = np.load(pose_path).astype(np.float32)
        traj.append(c2w[:3, 3])

        want = 0
        for k, s in enumerate(mesh_steps):
            if s <= step:
                want = k
        if want != cur_mesh_idx:
            renderer.close()
            renderer = _MeshRenderer(meshes[want])
            cur_mesh_idx = want

        color, depth = renderer.render(view_c2w, H, W, f)
        img = np.ascontiguousarray(
            (np.clip(color, 0, 1) * 255).astype(np.uint8)[..., ::-1])

        # trajectory so far (green)
        for a, b in zip(traj[:-1], traj[1:]):
            _draw_segment(img, depth, np.asarray(a), np.asarray(b),
                          view_c2w, f, (80, 220, 80))
        # planning path (cyan) — saved as [K, 3] waypoints
        pp = os.path.join(run_dir, "planning_path", f"{step:04d}.npy")
        if os.path.exists(pp):
            path = np.load(pp)
            for a, b in zip(path[:-1], path[1:]):
                _draw_segment(img, depth, a.astype(np.float32),
                              b.astype(np.float32), view_c2w, f,
                              (255, 200, 60))
        # look-at target lines (magenta) — [K, 3] targets from the pose
        lt = os.path.join(run_dir, "lookat_tgts", f"{step:04d}.npy")
        if os.path.exists(lt):
            tgts = np.load(lt).reshape(-1, 3)
            for t in tgts:
                _draw_segment(img, depth, c2w[:3, 3], t.astype(np.float32),
                              view_c2w, f, (255, 80, 255))
        # agent frustum (red)
        for a, b in _frustum_lines(c2w, scale=0.15 * diag):
            _draw_segment(img, depth, a, b, view_c2w, f, (60, 60, 255))

        state_file = os.path.join(run_dir, "state", f"{step:04d}.txt")
        if os.path.exists(state_file):
            with open(state_file) as sf:
                cv2.putText(img, sf.read().strip(), (8, 20),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255),
                            1, cv2.LINE_AA)

        out = os.path.join(out_dir, f"replay_{step:04d}.png")
        cv2.imwrite(out, img)
        outs.append(out)
    renderer.close()

    if video_path:
        vw = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             10, (W, H))
        for o in outs:
            vw.write(cv2.imread(o))
        vw.release()
    return outs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["traj", "mesh_evo", "video", "replay"])
    p.add_argument("--run", required=True,
                   help="run visualization dir (containing pose/, rgbd/ ...)")
    p.add_argument("--out", required=True)
    p.add_argument("--video", default=None,
                   help="optional mp4 path for replay mode")
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--kind", default="color_mesh",
                   help="mesh_evo subdir: color_mesh | uncert_mesh (saver "
                        "artifacts) or mesh (engine's periodic snapshots)")
    args = p.parse_args(argv)
    if args.mode == "traj":
        plot_trajectory(args.run, args.out)
    elif args.mode == "mesh_evo":
        mesh_evolution(args.run, args.out, kind=args.kind)
    elif args.mode == "replay":
        replay(args.run, args.out, stride=args.stride,
               video_path=args.video)
    else:
        make_video(args.run, args.out)


if __name__ == "__main__":
    main()

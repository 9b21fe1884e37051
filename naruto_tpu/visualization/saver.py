"""Per-step artifact saver — the reference's observability story.

Directory contract parity with NARUTOVisualizer (src/visualization/
naruto_visualizer.py:57-223) so the reference's offline replay tooling
conventions carry over:
    <result_dir>/visualization/
        rgbd/{step:04d}.png            side-by-side RGB | jet depth
        pose/{step:04d}.npy            c2w 4x4
        planning_path/{step:04d}.npy   current path (K, 3 metric) or empty
        lookat_tgts/{step:04d}.npy     look-at targets (K, 3)
        state/{step:04d}.txt           planner FSM state
        color_mesh/{step:04d}.ply      every save_mesh_freq steps
        uncert_mesh/{step:04d}.ply
        README.txt                     manifest
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from naruto_tpu.config.schema import MainConfig
from naruto_tpu.utils.printer import InfoPrinter

_MANIFEST = """NARUTO-TPU visualization artifacts
rgbd/           per-step RGB-D previews (png)
pose/           per-step camera-to-world poses (npy, RDF)
planning_path/  planned path vertices in metric coords (npy)
lookat_tgts/    uncertain look-at target locations (npy)
state/          planner FSM state (txt)
color_mesh/     periodic color mesh snapshots (ply)
uncert_mesh/    periodic uncertainty mesh snapshots (ply)
"""


class ArtifactSaver:
    def __init__(self, cfg: MainConfig,
                 printer: Optional[InfoPrinter] = None):
        self.cfg = cfg
        self.vcfg = cfg.vis
        self.printer = printer or InfoPrinter(quiet=True)
        self.step = 0
        self.root = os.path.join(cfg.general.result_dir, cfg.general.dataset,
                                 cfg.general.scene, "visualization")
        for sub in ("rgbd", "pose", "planning_path", "lookat_tgts", "state",
                    "color_mesh", "uncert_mesh"):
            os.makedirs(os.path.join(self.root, sub), exist_ok=True)
        with open(os.path.join(self.root, "README.txt"), "w") as f:
            f.write(_MANIFEST)

    def update_step(self, step: int) -> None:
        self.step = step

    def _p(self, sub: str, ext: str) -> str:
        return os.path.join(self.root, sub, f"{self.step:04d}.{ext}")

    def main(self, mapper, planner, color, depth, c2w) -> None:
        v = self.vcfg
        if v.save_rgbd:
            self._save_rgbd(np.asarray(color), np.asarray(depth))
        if v.save_pose:
            np.save(self._p("pose", "npy"), np.asarray(c2w))
        if v.save_planning_path:
            path = getattr(planner, "path", None) or []
            pts = (np.stack([planner.vox2loc(p) for p in path])
                   if path else np.zeros((0, 3)))
            np.save(self._p("planning_path", "npy"), pts)
        if v.save_lookat_tgts:
            tgts = getattr(planner, "lookat_tgts", None) or []
            np.save(self._p("lookat_tgts", "npy"),
                    np.stack(tgts) if tgts else np.zeros((0, 3)))
        if v.save_state:
            with open(self._p("state", "txt"), "w") as f:
                f.write(str(getattr(planner, "state", "")))
        if self.step % v.save_mesh_freq == 0:
            from naruto_tpu.mesh.extract import save_mesh
            if v.save_color_mesh:
                save_mesh(mapper, self._p("color_mesh", "ply"),
                          voxel_size=v.save_mesh_voxel_size,
                          color_mode="color")
            if v.save_uncert_mesh:
                save_mesh(mapper, self._p("uncert_mesh", "ply"),
                          voxel_size=v.save_mesh_voxel_size,
                          color_mode="uncert")

    def _save_rgbd(self, color: np.ndarray, depth: np.ndarray) -> None:
        import cv2
        import matplotlib.cm as cm

        d = depth.copy()
        trunc = self.cfg.cam.depth_trunc
        d = np.clip(d, 0, min(np.percentile(d[d > 0], 99.5)
                              if (d > 0).any() else 1.0, trunc))
        dn = d / (d.max() + 1e-9)
        djet = (cm.jet(dn)[..., :3] * 255).astype(np.uint8)
        rgb = (np.clip(color, 0, 1) * 255).astype(np.uint8)
        panel = np.concatenate([rgb, djet], axis=1)
        bgr = cv2.cvtColor(panel, cv2.COLOR_RGB2BGR)
        cv2.imwrite(self._p("rgbd", "png"), bgr)
        if self.vcfg.vis_rgbd:
            self._show_live(bgr)

    def _show_live(self, bgr: np.ndarray) -> None:
        """Live side-by-side RGB | jet-depth window (ref visualize_rgbd,
        src/visualization/visualizer.py:67-106). No-ops quietly when no
        display/GUI backend exists (headless CI)."""
        if getattr(self, "_live_failed", False):
            return
        import os

        if not (os.environ.get("DISPLAY") or os.name == "nt"):
            self._live_failed = True
            return
        try:
            import cv2

            cv2.imshow("naruto_tpu rgbd", bgr)
            cv2.waitKey(1)
        except Exception:
            self._live_failed = True

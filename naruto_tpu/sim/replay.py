"""Replay simulator: serve RGB-D frames recorded on disk.

The reference's passive-mapping path drives the SLAM from Replica-SLAM data
(use_traj_pose=True with SLAMData_dir — pose_loader.py:106-164, dataset
stubs in src/slam/coslam/datasets/dataset.py). This backend serves the same
directory layout:
    <dir>/results/frame%06d.jpg   RGB
    <dir>/results/depth%06d.png   depth, uint16 / png_depth_scale meters
    <dir>/traj.txt                per-frame c2w (RUB rows; see PoseLoader)
The requested pose is ignored (frames were recorded along the trajectory) —
identical to how the reference consumes this data.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from naruto_tpu.config.schema import MainConfig
from naruto_tpu.sim.base import Simulator
from naruto_tpu.utils.printer import InfoPrinter


class ReplaySimulator(Simulator):
    def __init__(self, cfg: MainConfig,
                 printer: Optional[InfoPrinter] = None):
        super().__init__(cfg, printer)
        self.root = cfg.sim.scene_path
        self.results_dir = os.path.join(self.root, "results")
        if not os.path.isdir(self.results_dir):
            # some exports keep frames at the top level
            self.results_dir = self.root
        self.depth_scale = cfg.cam.png_depth_scale

    def _frame_paths(self, i: int):
        rgb = os.path.join(self.results_dir, f"frame{i:06d}.jpg")
        if not os.path.exists(rgb):
            rgb = os.path.join(self.results_dir, f"frame{i:06d}.png")
        depth = os.path.join(self.results_dir, f"depth{i:06d}.png")
        return rgb, depth

    def simulate(self, c2w, return_erp: bool = False):
        import cv2

        rgb_path, depth_path = self._frame_paths(self.step)
        bgr = cv2.imread(rgb_path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(rgb_path)
        color = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        depth_raw = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
        if depth_raw is None:
            raise FileNotFoundError(depth_path)
        depth = depth_raw.astype(np.float32) / self.depth_scale
        if return_erp:
            raise NotImplementedError(
                "replay data carries no ERP sensor; use analytic or raycast")
        return color, depth

"""Scripted offline simulation: drive a simulator along a motion profile and
save observations.

Parity with the reference's offline data-generation utilities
(src/simulator/habitat_utils.py:483-771): motion profiles (stationary /
random / spiral_forward / forward / predefined), per-frame RGB-D + pose +
intrinsics export, optional video.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from naruto_tpu.geometry.pose import lookat_rotation


def generate_motion_profile(profile: str, n_frames: int,
                            start_c2w: np.ndarray,
                            radius: float = 1.0,
                            seed: int = 0,
                            predefined: Optional[List[np.ndarray]] = None
                            ) -> List[np.ndarray]:
    """Returns a list of c2w poses (RDF)."""
    rng = np.random.default_rng(seed)
    start = np.asarray(start_c2w, dtype=np.float32)
    poses = []
    if profile == "stationary":
        poses = [start.copy() for _ in range(n_frames)]
    elif profile == "forward":
        for i in range(n_frames):
            p = start.copy()
            p[:3, 3] += p[:3, 2] * (0.02 * i)   # move along +z (forward, RDF)
            poses.append(p)
    elif profile == "spiral_forward":
        center = start[:3, 3]
        for i in range(n_frames):
            ang = 2 * np.pi * i / max(n_frames, 1)
            pos = center + np.array([radius * np.cos(ang),
                                     radius * np.sin(ang),
                                     0.002 * i], dtype=np.float32)
            p = start.copy()
            p[:3, :3] = lookat_rotation(pos, center) @ np.diag([1, -1, -1])
            p[:3, 3] = pos
            poses.append(p)
    elif profile == "random":
        p = start.copy()
        for _ in range(n_frames):
            p = p.copy()
            p[:3, 3] += rng.normal(scale=0.02, size=3).astype(np.float32)
            poses.append(p)
    elif profile == "predefined":
        if predefined is None:
            raise ValueError("predefined profile needs poses")
        poses = [np.asarray(q, dtype=np.float32) for q in predefined]
    else:
        raise ValueError(f"unknown motion profile: {profile}")
    return poses


def run_scripted_simulation(sim, poses: List[np.ndarray], out_dir: str,
                            save_video: bool = False,
                            depth_scale: float = 6553.5,
                            pose_format: str = "replica") -> None:
    """Render every pose and save frames/poses/K in the Replica-SLAM layout
    consumed by ReplaySimulator (frame%06d.jpg / depth%06d.png / traj.txt).

    pose_format 'replica' writes traj.txt rows in the Replica convention
    (RUB — PoseLoader flips columns 1,2 back on load); 'raw' writes the RDF
    poses verbatim (MP3D convention)."""
    import cv2

    res = os.path.join(out_dir, "results")
    os.makedirs(res, exist_ok=True)
    frames = []
    for i, c2w in enumerate(poses):
        sim.update_step(i)
        color, depth = sim.simulate(c2w)[:2]
        color = np.asarray(color)
        depth = np.asarray(depth)
        bgr = cv2.cvtColor((np.clip(color, 0, 1) * 255).astype(np.uint8),
                           cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(res, f"frame{i:06d}.jpg"), bgr)
        d16 = np.clip(depth * depth_scale, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(res, f"depth{i:06d}.png"), d16)
        if save_video:
            frames.append(bgr)
    with open(os.path.join(out_dir, "traj.txt"), "w") as f:
        for c2w in poses:
            out_pose = np.asarray(c2w, dtype=np.float64).copy()
            if pose_format == "replica":
                out_pose[:3, 1] *= -1    # RDF -> RUB columns (involution)
                out_pose[:3, 2] *= -1
            f.write(" ".join(f"{x:.8f}" for x in out_pose.reshape(-1))
                    + "\n")
    if save_video and frames:
        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(os.path.join(out_dir, "rgb.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 20, (w, h))
        for fr in frames:
            vw.write(fr)
        vw.release()

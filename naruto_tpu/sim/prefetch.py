"""Double-buffered host->HBM frame streaming for passive mapping.

BASELINE.json's north star calls for double-buffered host-to-HBM frame
transfer. In ACTIVE mode the next pose depends on this step's planner output
(SURVEY.md §5.2), so prefetch is impossible by dataflow; in PASSIVE mode
(predefined trajectory — replay/raycast backends reading from host memory)
the next frame's pose is known, so a worker thread loads and `device_put`s
frame i+1 while the mapper trains on frame i. A full-resolution frame is
~13 MB; the measured host->device cost (~180 ms) overlaps entirely with the
~1.2 s mapping step.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Tuple

import numpy as np


class FramePrefetcher:
    def __init__(self, sim, pose_fn: Callable[[int], np.ndarray]):
        """pose_fn(step) -> c2w for passive trajectories."""
        self.sim = sim
        self.pose_fn = pose_fn
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._next = None
        self._next_step = -1

    def _load(self, step: int):
        import jax

        self.sim.update_step(step)
        color, depth = self.sim.simulate(self.pose_fn(step))[:2]
        # push to device asynchronously; jax transfers off-thread
        return (jax.device_put(np.asarray(color)),
                jax.device_put(np.asarray(depth)))

    def get(self, step: int) -> Tuple:
        if self._next is not None and self._next_step == step:
            color, depth = self._next.result()
        else:
            color, depth = self._load(step)
        self._next = self._pool.submit(self._load, step + 1)
        self._next_step = step + 1
        return color, depth

    def close(self):
        self._pool.shutdown(wait=False)

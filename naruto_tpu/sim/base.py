"""Simulator interface.

Contract modeled on the reference simulator layer (src/simulator/
simulator.py:31-58, habitat_simulator.py:81-146):
  simulate(c2w, return_erp=False) ->
      (color [H,W,3] float in [0,1], depth [H,W] z-depth meters)
   or (color, depth, erp_color [He,We,3], erp_dist [He,We] radial distance,
       invalid -> 1e8)

Convention: c2w is the mapper's RDF camera-to-world pose; backends that
natively use RUB (habitat-style assets) convert internally — the reference
does the mirror conversion in pose_loader.py:167-234.
"""
from __future__ import annotations

from typing import Optional

from naruto_tpu.config.schema import MainConfig
from naruto_tpu.utils.printer import InfoPrinter


class Simulator:
    def __init__(self, cfg: MainConfig,
                 printer: Optional[InfoPrinter] = None):
        self.cfg = cfg
        self.sim_cfg = cfg.sim
        self.printer = printer or InfoPrinter(quiet=True)
        self.step = 0

    def update_step(self, step: int) -> None:
        self.step = step

    def simulate(self, c2w, return_erp: bool = False):
        raise NotImplementedError

    def probe_erp_dist(self, c2w):
        """ERP distance map only — what collision probes consume (planner
        detect_collision, ref detect_collision_v2). Backends with a cheaper
        distance-only path override this; the fallback renders the full
        frame and discards everything but the distances (sim.probe_hw is
        honored only by backends with a resolution-parametric path)."""
        return self.simulate(c2w, return_erp=True)[3]

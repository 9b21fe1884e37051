from naruto_tpu.sim.base import Simulator
from naruto_tpu.sim.analytic import AnalyticSimulator


def init_simulator(cfg, printer=None):
    """Simulator factory (ref: src/simulator/__init__.py:31-50)."""
    method = cfg.sim.method
    if method == "analytic":
        return AnalyticSimulator(cfg, printer)
    if method == "replay":
        from naruto_tpu.sim.replay import ReplaySimulator
        return ReplaySimulator(cfg, printer)
    if method == "raycast":
        from naruto_tpu.sim.raycast import RaycastSimulator
        return RaycastSimulator(cfg, printer)
    raise ValueError(f"unknown simulator method: {method}")


__all__ = ["Simulator", "AnalyticSimulator", "init_simulator"]

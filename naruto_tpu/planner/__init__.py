from naruto_tpu.planner.naruto_planner import NarutoPlanner


def init_planner(cfg, printer=None):
    """Planner factory (ref: src/planner/__init__.py:31-50)."""
    method = cfg.planner.method
    if method == "naruto":
        return NarutoPlanner(cfg, printer)
    raise ValueError(f"unknown planner method: {method}")


__all__ = ["NarutoPlanner", "init_planner"]

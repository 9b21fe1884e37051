from naruto_tpu.system.engine import Engine
from naruto_tpu.system.pose_loader import PoseLoader

__all__ = ["Engine", "PoseLoader"]

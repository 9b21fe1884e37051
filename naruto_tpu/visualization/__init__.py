from naruto_tpu.visualization.saver import ArtifactSaver

__all__ = ["ArtifactSaver"]

from naruto_tpu.config.schema import (
    CamConfig,
    DecoderConfig,
    GeneralConfig,
    GridConfig,
    MainConfig,
    MapperConfig,
    MeshConfig,
    PlannerConfig,
    SimConfig,
    TrainingConfig,
    VisConfig,
)
from naruto_tpu.config.loader import load_config, make_config, list_scenes

__all__ = [
    "CamConfig", "DecoderConfig", "GeneralConfig", "GridConfig", "MainConfig",
    "MapperConfig", "MeshConfig", "PlannerConfig", "SimConfig",
    "TrainingConfig", "VisConfig", "load_config", "make_config", "list_scenes",
]

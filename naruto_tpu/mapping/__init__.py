from naruto_tpu.mapping.field import FieldSpec, init_field_params, field_query
from naruto_tpu.mapping.mapper import Mapper


def init_mapper(cfg, printer=None, method: str = "coslam"):
    """Mapper factory (ref: src/slam/__init__.py:31-50 dispatches on
    slam.method == 'coslam')."""
    if method == "coslam":
        return Mapper(cfg, printer)
    raise ValueError(f"unknown SLAM method: {method}")


__all__ = ["FieldSpec", "init_field_params", "field_query", "Mapper",
           "init_mapper"]

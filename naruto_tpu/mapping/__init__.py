from naruto_tpu.mapping.field import FieldSpec, init_field_params, field_query
from naruto_tpu.mapping.mapper import Mapper

__all__ = ["FieldSpec", "init_field_params", "field_query", "Mapper"]

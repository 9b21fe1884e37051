from naruto_tpu.geometry.rays import get_camera_rays
from naruto_tpu.geometry.pose import (
    lookat_rotation,
    rub_to_rdf,
    rdf_to_rub,
    transform_rays,
)
from naruto_tpu.geometry.voxel import voxel_axes, volume_shape, world_grid

__all__ = [
    "get_camera_rays", "lookat_rotation", "rub_to_rdf", "rdf_to_rub",
    "transform_rays", "voxel_axes", "volume_shape", "world_grid",
]

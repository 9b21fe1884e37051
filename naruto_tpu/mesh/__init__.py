from naruto_tpu.mesh.marching import marching_cubes
from naruto_tpu.mesh.ply import write_ply, read_ply
from naruto_tpu.mesh.extract import extract_mesh, save_mesh

__all__ = ["marching_cubes", "write_ply", "read_ply", "extract_mesh",
           "save_mesh"]

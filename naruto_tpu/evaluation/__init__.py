from naruto_tpu.evaluation.recon import (
    eval_mesh, sample_surface_points, nearest_distances,
)
from naruto_tpu.evaluation.mad import eval_mad
from naruto_tpu.evaluation.traj import eval_traj_length
from naruto_tpu.evaluation.cull import cull_mesh

__all__ = ["eval_mesh", "sample_surface_points", "nearest_distances",
           "eval_mad", "eval_traj_length", "cull_mesh"]

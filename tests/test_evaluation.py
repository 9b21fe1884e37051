"""Evaluation metric tests with analytic ground truth."""
import numpy as np
import pytest

from naruto_tpu.evaluation import (
    cull_mesh, eval_mesh, eval_traj_length, nearest_distances,
    sample_surface_points,
)
from naruto_tpu.evaluation.recon import icp_align
from naruto_tpu.mesh.marching import marching_cubes


def unit_sphere_mesh(n=48, r=16.0):
    g = np.arange(n, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2.0
    sdf = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - r
    v, f = marching_cubes(sdf, truncation=1e9)
    return (v - c) / r, f  # unit sphere


class TestRecon:
    def test_identical_meshes_near_zero(self):
        v, f = unit_sphere_mesh()
        m = eval_mesh(v, f, v, f, n_samples=100_000)
        assert m["fscore_pct"] > 99.9    # identical meshes: perfect F-score
        # floor = sampling noise (~0.5cm at this density on a unit sphere)
        assert m["accuracy_cm"] < 1.0
        assert m["completion_cm"] < 1.0
        assert m["completion_ratio_pct"] > 99.0

    def test_shifted_mesh_detected(self):
        v, f = unit_sphere_mesh()
        m = eval_mesh(v + np.array([0.1, 0, 0]), f, v, f, n_samples=20000)
        # 10cm x-shift on a unit sphere -> mean distance of a few cm
        assert 2.0 < m["accuracy_cm"] < 10.0
        assert m["completion_ratio_pct"] < 90.0

    def test_icp_recovers_shift(self):
        v, f = unit_sphere_mesh()
        pts = sample_surface_points(v, f, 5000)
        # non-symmetric cloud: take half sphere
        pts = pts[pts[:, 0] > 0]
        shifted = pts + np.array([0.05, -0.03, 0.02])
        T = icp_align(shifted, pts)
        out = shifted @ T[:3, :3].T + T[:3, 3]
        assert nearest_distances(out, pts).mean() < 0.01

    def test_surface_sampling_on_surface(self):
        v, f = unit_sphere_mesh()
        pts = sample_surface_points(v, f, 10000)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0,
                                   atol=0.05)


class TestTraj:
    def test_length(self):
        poses = np.tile(np.eye(4), (4, 1, 1))
        poses[1, :3, 3] = [1, 0, 0]
        poses[2, :3, 3] = [1, 1, 0]
        poses[3, :3, 3] = [1, 1, 2]
        assert eval_traj_length(poses) == pytest.approx(4.0)


class TestCull:
    def test_frustum_culling(self):
        v, f = unit_sphere_mesh(32, 10.0)
        # camera at -3z looking +z sees only the near hemisphere
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, -3.0]
        # narrow FoV: only the central cap of the sphere is inside
        K = np.array([[200.0, 0, 31.5], [0, 200.0, 31.5], [0, 0, 1]])
        cv, cf = cull_mesh(v, f, [pose], K, (64, 64), depth_fn=None)
        assert 0 < len(cv) < len(v)
        # kept vertices lie near the optical axis
        assert np.abs(cv[:, :2]).max() < 0.6

    def test_occlusion_culling(self):
        v, f = unit_sphere_mesh(32, 10.0)
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, -3.0]
        K = np.array([[50.0, 0, 31.5], [0, 50.0, 31.5], [0, 0, 1]])
        # observed depth: the near surface at z ~= -1 -> depth ~= 2
        depth = np.full((64, 64), 2.1, dtype=np.float32)
        cv, cf = cull_mesh(v, f, [pose], K, (64, 64),
                           depth_fn=lambda i: depth)
        # far hemisphere (depth ~4) is occluded and removed
        assert cv[:, 2].max() < 0.5


def test_eval_cli_smoke(tmp_path):
    from naruto_tpu.mesh.ply import write_ply
    from naruto_tpu import evaluate

    v, f = unit_sphere_mesh(32, 10.0)
    rec = str(tmp_path / "rec.ply")
    gt = str(tmp_path / "gt.ply")
    write_ply(rec, v, f)
    write_ply(gt, v, f)
    out = str(tmp_path / "eval_result.txt")
    evaluate.main(["--rec", rec, "--gt", gt, "--out", out,
                   "--n_samples", "5000"])
    with open(out) as fh:
        header = fh.readline()
    assert "accuracy_cm" in header


def test_merge_seed_results(tmp_path):
    """5-trial protocol: per-seed eval rows merge into one table with
    mean/std (ref scripts/naruto/run_replica.sh seeds)."""
    from naruto_tpu.utils.results import merge_seed_results, \
        update_results_file

    scene = tmp_path / "office0"
    for seed, acc in ((0, 1.0), (500, 2.0), (1999, 3.0)):
        d = scene / f"seed_{seed}" / "Replica" / "office0"
        d.mkdir(parents=True)
        update_results_file({"accuracy_cm": acc, "mad_cm": acc / 2},
                            str(d / "eval_result.txt"))
    out = merge_seed_results(str(scene))
    lines = open(out).read().strip().splitlines()
    assert lines[0] == "trial,accuracy_cm,mad_cm"
    assert len(lines) == 6       # 3 seeds + mean + std
    mean = [float(x) for x in lines[-2].split(",")[1:]]
    assert abs(mean[0] - 2.0) < 1e-6 and abs(mean[1] - 1.0) < 1e-6

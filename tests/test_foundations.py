"""Foundation tests: config tree, geometry, voxel math, utils."""
import numpy as np
import pytest

from naruto_tpu.config import make_config, list_scenes
from naruto_tpu.config.schema import deep_update
from naruto_tpu.geometry import get_camera_rays, lookat_rotation
from naruto_tpu.geometry.pose import rdf_to_rub, rub_to_rdf, replica_traj_to_rdf
from naruto_tpu.geometry.voxel import (
    axis_count, volume_shape, voxel_axes, world_grid, vox2loc, loc2vox,
    normalize_points,
)
from naruto_tpu.utils import Timer, update_results_file


class TestConfig:
    def test_presets_cover_all_reference_scenes(self):
        scenes = list_scenes()
        assert len(scenes["Replica"]) == 8
        assert len(scenes["MP3D"]) == 5
        assert len(scenes["NARUTO"]) == 3

    def test_office0_defaults(self):
        cfg = make_config("Replica", "office0")
        assert cfg.general.num_iter == 2000
        assert cfg.mapper.bound == ((-2.2, 2.6), (-3.4, 2.1), (-1.4, 2.0))
        assert cfg.mapper.sample == 2048
        assert cfg.training.sdf_weight == 1000
        assert cfg.cam.H == 680 and cfg.cam.W == 1200

    def test_mp3d_budget(self):
        cfg = make_config("MP3D", "gZ6f7yhEvPG")
        assert cfg.general.num_iter == 5000

    def test_deep_update(self):
        cfg = make_config("Replica", "office0")
        cfg2 = deep_update(cfg, {"mapper": {"iters": 3}, "general": {"seed": 7}})
        assert cfg2.mapper.iters == 3 and cfg2.general.seed == 7
        assert cfg.mapper.iters == 10  # original untouched

    def test_unknown_key_raises(self):
        cfg = make_config("Replica", "office0")
        with pytest.raises(KeyError):
            deep_update(cfg, {"mapper": {"nope": 1}})


class TestRays:
    def test_center_pixel_unit_z(self):
        rays = get_camera_rays(680, 1200, 600.0, 600.0, 599.5, 339.5)
        assert rays.shape == (680, 1200, 3)
        # pixel at principal point (u=cx -> x=0)... cx=599.5 lies between
        # pixels; check analytic values at u=0,v=0
        np.testing.assert_allclose(
            rays[0, 0], [(0 - 599.5) / 600.0, (0 - 339.5) / 600.0, 1.0],
            rtol=1e-6)
        assert np.all(rays[..., 2] == 1.0)

    def test_backproject_consistency(self):
        # depth * dir recovers a point that reprojects to the same pixel
        rays = get_camera_rays(10, 20, 30.0, 30.0)
        d = 2.5
        pt = rays[3, 7] * d
        u = pt[0] / pt[2] * 30.0 + (20 / 2 - 0.5)
        v = pt[1] / pt[2] * 30.0 + (10 / 2 - 0.5)
        assert abs(u - 7) < 1e-5 and abs(v - 3) < 1e-5


class TestPose:
    def test_lookat_basic(self):
        R = lookat_rotation(np.array([0, 0, 0.0]), np.array([1, 0, 0.0]))
        # backward = -x; right = up x back = (0,0,1)x(-1,0,0) = (0,-1,0)
        np.testing.assert_allclose(R[:, 2], [-1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(R[:, 0], [0, -1, 0], atol=1e-6)
        np.testing.assert_allclose(R[:, 1], [0, 0, 1], atol=1e-6)
        # proper rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) > 0.99

    def test_lookat_vertical_degenerate(self):
        R = lookat_rotation(np.array([0, 0, 1.0]), np.array([0, 0, 0.0]))
        assert np.all(np.isfinite(R))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_rdf_rub_roundtrip(self):
        rng = np.random.default_rng(1)
        # random valid pose
        A = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(A)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = q
        T[:3, 3] = rng.normal(size=3)
        np.testing.assert_allclose(rub_to_rdf(rdf_to_rub(T)), T, atol=1e-6)

    def test_replica_traj_conversion(self):
        T = np.eye(4, dtype=np.float32)
        out = replica_traj_to_rdf(T)
        np.testing.assert_allclose(out, np.diag([1, -1, -1, 1]), atol=1e-7)


class TestVoxel:
    def test_axis_count_matches_reference_formula(self):
        # office0: x length 4.8 at 0.1 -> 48+1=49 (SURVEY: 49x56x35)
        bound = np.array([[-2.2, 2.6], [-3.4, 2.1], [-1.4, 2.0]])
        assert volume_shape(bound, 0.1) == (49, 56, 35)

    def test_axes_endpoints(self):
        bound = np.array([[0.0, 1.0], [0.0, 2.0], [0.0, 0.5]])
        tx, ty, tz = voxel_axes(bound, 0.5)
        np.testing.assert_allclose(tx, [0, 0.5, 1.0])
        np.testing.assert_allclose(ty, [0, 0.5, 1.0, 1.5, 2.0])
        np.testing.assert_allclose(tz, [0, 0.5])

    def test_world_grid_shape(self):
        bound = np.array([[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]])
        g = world_grid(bound, 0.5)
        assert g.shape == (3, 3, 3, 3)
        np.testing.assert_allclose(g[0, 0, 0], [0, 0, 0])
        np.testing.assert_allclose(g[-1, -1, -1], [1, 1, 1])

    def test_vox_loc_roundtrip(self):
        bound = np.array([[-2.0, 2.0], [-1.0, 3.0], [0.0, 1.0]])
        v = np.array([3.0, 4.0, 5.0])
        np.testing.assert_allclose(loc2vox(vox2loc(v, bound, 0.1), bound, 0.1), v)

    def test_normalize(self):
        bound = np.array([[-1.0, 1.0], [0.0, 2.0], [0.0, 4.0]])
        p = np.array([[0.0, 1.0, 2.0]])
        np.testing.assert_allclose(normalize_points(p, bound), [[0.5, 0.5, 0.5]])


class TestUtils:
    def test_timer(self):
        t = Timer()
        with t.time("a", "G"):
            pass
        assert t.total("a") >= 0
        assert "a" in t.summary()

    def test_results_file_merge(self, tmp_path):
        p = str(tmp_path / "eval_result.txt")
        update_results_file({"acc": 1.0}, p)
        update_results_file({"comp": 2.0}, p)
        with open(p) as f:
            header, vals = f.read().strip().split("\n")
        assert header == "acc,comp"
        assert vals.startswith("1.0") and "2.0" in vals

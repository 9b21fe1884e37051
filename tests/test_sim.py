"""ERP geometry + analytic simulator + engine end-to-end smoke tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from naruto_tpu.config import make_config
from naruto_tpu.config.schema import deep_update
from naruto_tpu.geometry.erp import (
    c2e, depth2dist, dirs_to_erp_uv, e2p, erp_depth_to_dist, erp_ray_dirs,
    FACE_ROTATIONS,
)
from naruto_tpu.sim import init_simulator


class TestERP:
    def test_ray_dirs_unit_and_axes(self):
        d = np.asarray(erp_ray_dirs(64, 128))
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        # center pixel looks forward (+z)
        np.testing.assert_allclose(d[32, 64], [0, 0, 1], atol=0.06)
        # top rows look up (-y in RDF)
        assert d[0, :, 1].mean() < -0.95

    def test_uv_roundtrip(self):
        d = erp_ray_dirs(32, 64)
        v, u = dirs_to_erp_uv(d)
        vv = (np.arange(32) + 0.5) / 32
        uu = (np.arange(64) + 0.5) / 64
        np.testing.assert_allclose(np.asarray(v), np.tile(vv[:, None], (1, 64)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(u), np.tile(uu[None], (32, 1)),
                                   atol=1e-5)

    def test_depth2dist_center(self):
        depth = jnp.full((10, 10), 2.0)
        dist = depth2dist(depth, 5.0, 5.0, 4.5, 4.5)
        # center pixel: scale 1; corners: larger
        assert float(dist[4, 4]) < float(dist[0, 0])
        np.testing.assert_allclose(float(dist[4, 4]), 2.0 * np.sqrt(1 + 0.02),
                                   rtol=0.02)

    def test_e2p_c2e_roundtrip_constant(self):
        erp = jnp.full((64, 128), 3.0)
        faces = jnp.stack([e2p(erp, FACE_ROTATIONS[i], 32) for i in range(6)])
        back = c2e(faces, 64, 128)
        np.testing.assert_allclose(np.asarray(back), 3.0, atol=1e-4)

    def test_erp_depth_to_dist_sphere_consistency(self):
        # a constant-distance scene: ERP plane depth of a sphere of radius R
        # around the camera is R * cos(angle from forward per-face)...
        # instead test the inverse property: constant plane depth -> distance
        # >= depth with equality straight ahead
        H, W = 32, 64
        erp_depth = jnp.full((H, W), 2.0)
        dist = np.asarray(erp_depth_to_dist(erp_depth, face_hw=64))
        assert abs(dist[H // 2, W // 2] - 2.0) < 0.05
        assert np.all(dist >= 2.0 - 0.05)

    def test_invalid_depth_becomes_large(self):
        H, W = 16, 32
        d = np.full((H, W), 1.0, dtype=np.float32)
        d[0, 0] = 0.0
        out = np.asarray(erp_depth_to_dist(jnp.asarray(d), face_hw=32))
        assert out[0, 0] == 1e8


BOUND = ((-1.5, 1.5), (-1.5, 1.5), (-1.0, 1.0))


def sim_cfg():
    cfg = make_config("Replica", "office0", num_iter=20)
    return deep_update(cfg, {
        "cam": {"H": 30, "W": 40, "fx": 25.0, "fy": 25.0, "cx": 19.5,
                "cy": 14.5},
        "sim": {"method": "analytic", "pinhole_hw": (30, 40),
                "erp_hw": (24, 48)},
        "mapper": {"bound": BOUND, "marching_cubes_bound": BOUND},
    })


class TestAnalyticSim:
    @pytest.fixture(scope="class")
    def sim(self):
        return init_simulator(sim_cfg())

    def test_pinhole_render(self, sim):
        c2w = np.eye(4, dtype=np.float32)
        color, depth = sim.simulate(c2w)
        color, depth = np.asarray(color), np.asarray(depth)
        assert color.shape == (30, 40, 3) and depth.shape == (30, 40)
        assert (color >= 0).all() and (color <= 1).all()
        # camera at origin looking +z: wall at 1.0 - margin = 0.85
        assert abs(depth[15, 20] - 0.85) < 0.02
        assert (depth > 0).mean() > 0.95  # closed room: almost all hit

    def test_depth_is_z_depth(self, sim):
        # z-depth of a flat wall is constant across the image center row
        c2w = np.eye(4, dtype=np.float32)
        _, depth = sim.simulate(c2w)
        depth = np.asarray(depth)
        row = depth[15, 15:25]
        np.testing.assert_allclose(row, row.mean(), atol=0.02)

    def test_erp_render(self, sim):
        c2w = np.eye(4, dtype=np.float32)
        out = sim.simulate(c2w, return_erp=True)
        assert len(out) == 4
        erp_color, erp_dist = np.asarray(out[2]), np.asarray(out[3])
        assert erp_dist.shape == (24, 48)
        # all distances positive and finite inside a closed room
        assert (erp_dist > 0.1).all() and (erp_dist < 1e6).all()
        # min distance bounded by distance to nearest wall (z: 0.85)
        assert erp_dist.min() < 0.95

    def test_gt_sdf(self, sim):
        # center of room is free, outside walls is negative
        assert sim.gt_sdf(np.array([[0.0, 0.0, 0.0]]))[0] > 0
        assert sim.gt_sdf(np.array([[1.49, 0.0, 0.0]]))[0] < 0


class TestEngineSmoke:
    def test_active_loop_runs(self, tmp_path):
        """Full active loop: sim -> map -> plan for 12 steps on tiny shapes."""
        cfg = sim_cfg()
        cfg = deep_update(cfg, {
            "grid": {"n_levels": 4, "hash_size": 12, "voxel_sdf": 0.1},
            "mapper": {"sample": 64, "iters": 2, "first_iters": 4,
                       "min_pixels_cur": 4, "act_ray_num_uncert_sample": 8,
                       "voxel_size": 0.25},
            "training": {"n_samples_d": 8, "n_range_d": 5, "smooth_pts": 4},
            "planner": {"gs_z_levels": [3, 4, 5]},
            "general": {"result_dir": str(tmp_path)},
        })
        from naruto_tpu.system.engine import Engine

        eng = Engine(cfg, quiet=True)
        final_pose = eng.run(num_iter=12)
        assert final_pose.shape == (4, 4)
        R = final_pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        # mapper saw all frames; volumes cadence respected
        assert int(eng.mapper.state.kf.count) >= 2
        assert eng.uncert_sdf is not None
        # finalize writes mesh + ckpt
        eng.finalize(str(tmp_path))
        import os
        files = os.listdir(tmp_path)
        assert any(f.endswith("_final.ply") for f in files)
        assert any(f.endswith("_final.pkl") for f in files)


class TestFrameSkip:
    def test_sim_render_skipped_on_unused_frames(self, tmp_path):
        """Frames that neither map, keyframe, nor track are never rendered:
        the engine consults mapper.needs_frame(i) and skips sim.simulate
        entirely (the raycast backend pays ~0.7 s/frame on one core)."""
        cfg = sim_cfg()
        cfg = deep_update(cfg, {
            "grid": {"n_levels": 4, "hash_size": 12, "voxel_sdf": 0.1},
            "mapper": {"sample": 64, "iters": 2, "first_iters": 4,
                       "min_pixels_cur": 4, "act_ray_num_uncert_sample": 8,
                       "voxel_size": 0.25},
            "training": {"n_samples_d": 8, "n_range_d": 5, "smooth_pts": 4},
            "planner": {"gs_z_levels": [3, 4, 5]},
            "general": {"result_dir": str(tmp_path)},
        })
        from naruto_tpu.system.engine import Engine

        eng = Engine(cfg, quiet=True)
        calls = []
        orig = eng.sim.simulate
        eng.sim.simulate = (
            lambda c2w, **kw: (calls.append(1), orig(c2w, **kw))[1])
        n = 12
        eng.run(num_iter=n)
        me, ke = cfg.mapper.map_every, cfg.mapper.keyframe_every
        expected = sum(1 for i in range(n)
                       if i == 0 or i % me == 0 or i % ke == 0)
        assert len(calls) == expected
        assert expected < n  # the skip actually fires
        # and the run still mapped + keyframed normally
        assert int(eng.mapper.state.kf.count) >= 2
        assert eng.uncert_sdf is not None


class TestVisualizerArtifacts:
    def _cfg(self, tmp_path, vis_over):
        cfg = sim_cfg()
        return deep_update(cfg, {
            "grid": {"n_levels": 4, "hash_size": 12, "voxel_sdf": 0.1},
            "mapper": {"sample": 64, "iters": 2, "first_iters": 4,
                       "min_pixels_cur": 4, "act_ray_num_uncert_sample": 8,
                       "voxel_size": 0.25},
            "training": {"n_samples_d": 8, "n_range_d": 5, "smooth_pts": 4},
            "planner": {"gs_z_levels": [3, 4, 5]},
            "general": {"result_dir": str(tmp_path)},
            "vis": {"enable_all_vis": True, "save_mesh_freq": 100,
                    **vis_over},
        })

    def test_artifact_contract(self, tmp_path):
        """ArtifactSaver writes the reference directory contract (rgbd /
        pose / planning_path / lookat_tgts / state + manifest), and with
        save_rgbd on, every frame is rendered (no skip)."""
        import os

        from naruto_tpu.system.engine import Engine

        cfg = self._cfg(tmp_path, {"save_rgbd": True})
        eng = Engine(cfg, quiet=True)
        calls = []
        orig = eng.sim.simulate
        eng.sim.simulate = (
            lambda c2w, **kw: (calls.append(1), orig(c2w, **kw))[1])
        eng.run(num_iter=7)
        assert len(calls) == 7  # rgbd artifact consumes every frame
        root = os.path.join(str(tmp_path), cfg.general.dataset,
                            cfg.general.scene, "visualization")
        assert open(os.path.join(root, "README.txt")).read().startswith(
            "NARUTO-TPU")
        for sub, ext in (("rgbd", "png"), ("pose", "npy"),
                         ("planning_path", "npy"), ("lookat_tgts", "npy"),
                         ("state", "txt")):
            files = os.listdir(os.path.join(root, sub))
            assert len(files) == 7, (sub, files)
        pose0 = np.load(os.path.join(root, "pose", "0000.npy"))
        assert pose0.shape == (4, 4)
        # rgbd png is a real image (PNG magic)
        with open(os.path.join(root, "rgbd", "0000.png"), "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"

    def test_skip_applies_without_rgbd_artifact(self, tmp_path):
        """With a visualizer attached but save_rgbd off, unconsumed frames
        still skip the render (poses/paths/state artifacts are
        frame-independent)."""
        from naruto_tpu.system.engine import Engine

        cfg = self._cfg(tmp_path, {"save_rgbd": False})
        eng = Engine(cfg, quiet=True)
        calls = []
        orig = eng.sim.simulate
        eng.sim.simulate = (
            lambda c2w, **kw: (calls.append(1), orig(c2w, **kw))[1])
        eng.run(num_iter=7)
        me, ke = cfg.mapper.map_every, cfg.mapper.keyframe_every
        expected = sum(1 for i in range(7)
                       if i == 0 or i % me == 0 or i % ke == 0)
        assert len(calls) == expected < 7


class TestDynamicScene:
    def test_dynamic_object_moves(self):
        cfg = deep_update(sim_cfg(), {"sim": {"analytic_scene":
                                              "dynamic_room"}})
        sim = init_simulator(cfg)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = -0.7  # look across the orbit circle at room center
        sim.update_step(0)
        _, d0 = sim.simulate(c2w)
        sim.update_step(20)
        _, d1 = sim.simulate(c2w)
        # the orbiting sphere changes the depth image between steps
        assert float(np.abs(np.asarray(d0) - np.asarray(d1)).max()) > 0.05


class TestDeterminism:
    def test_same_seed_same_trajectory(self, tmp_path):
        cfg = sim_cfg()
        cfg = deep_update(cfg, {
            "grid": {"n_levels": 4, "hash_size": 12, "voxel_sdf": 0.1},
            "mapper": {"sample": 64, "iters": 2, "first_iters": 4,
                       "min_pixels_cur": 4, "act_ray_num_uncert_sample": 8,
                       "voxel_size": 0.25},
            "training": {"n_samples_d": 8, "n_range_d": 5, "smooth_pts": 4},
            "planner": {"gs_z_levels": [3, 4, 5]},
            "general": {"result_dir": str(tmp_path)},
        })
        from naruto_tpu.system.engine import Engine

        p1 = Engine(cfg, quiet=True).run(num_iter=10)
        p2 = Engine(cfg, quiet=True).run(num_iter=10)
        np.testing.assert_allclose(p1, p2, atol=1e-6)

    def test_different_seed_diverges(self, tmp_path):
        cfg = sim_cfg()
        cfg = deep_update(cfg, {
            "grid": {"n_levels": 4, "hash_size": 12, "voxel_sdf": 0.1},
            "mapper": {"sample": 64, "iters": 2, "first_iters": 4,
                       "min_pixels_cur": 4, "act_ray_num_uncert_sample": 8,
                       "voxel_size": 0.25},
            "training": {"n_samples_d": 8, "n_range_d": 5, "smooth_pts": 4},
            "planner": {"gs_z_levels": [3, 4, 5]},
            "general": {"result_dir": str(tmp_path)},
        })
        from naruto_tpu.system.engine import Engine

        p1 = Engine(cfg, quiet=True).run(num_iter=10)
        cfg2 = deep_update(cfg, {"general": {"seed": 123}})
        p2 = Engine(cfg2, quiet=True).run(num_iter=10)
        # trajectories should differ somewhere (field init + sampling differ)
        assert not np.allclose(p1, p2, atol=1e-6)


class TestP2E:
    def test_p2e_e2p_roundtrip(self):
        """Projecting a perspective view back into ERP must reproduce the
        ERP content inside the view's footprint."""
        from naruto_tpu.geometry.erp import p2e_with_pose
        # smooth ERP pattern
        H, W = 48, 96
        v = jnp.linspace(0, 1, H)[:, None]
        u = jnp.linspace(0, 1, W)[None, :]
        erp = jnp.sin(4 * jnp.pi * u) * jnp.cos(2 * jnp.pi * v) + 2.0
        face = e2p(erp, FACE_ROTATIONS[0], 64)     # front view, 90 deg
        f = 32.0
        back = p2e_with_pose(face, FACE_ROTATIONS[0], H, W, f, f,
                             31.5, 31.5, fill=-1.0)
        back = np.asarray(back)
        erp_np = np.asarray(erp)
        # central (front-facing) ERP region must match
        rows, cols = slice(20, 28), slice(44, 52)
        np.testing.assert_allclose(back[rows, cols], erp_np[rows, cols],
                                   atol=0.05)
        # region behind the camera is fill
        assert np.all(back[:, :8] == -1.0)


def test_replay_erp_probe_guard():
    """Config-time guard: replay cannot serve MP3D/NARUTO active planning
    (collision probes need the sim's ERP sensor; recorded data has none)."""
    import pytest

    from naruto_tpu.config import make_config
    from naruto_tpu.config.schema import deep_update
    from naruto_tpu.sim import init_simulator

    cfg = make_config("MP3D", "pLe4wQe7qrG", num_iter=10)
    cfg = deep_update(cfg, {"sim": {"method": "replay"}})
    assert cfg.enable_active_planning
    with pytest.raises(ValueError, match="ERP"):
        init_simulator(cfg)


class TestFullStateResume:
    def test_engine_resume_continues_run(self, tmp_path):
        """--resume path: run A writes a periodic full-state snapshot; a
        FRESH engine resumed from it continues at the saved step + 1 with
        the saved pose, mapper pytree + rng key, and planner FSM/penalty
        state, and reaches the same step count as an uninterrupted run."""
        import os

        from naruto_tpu.system.engine import Engine

        def build(out):
            cfg = sim_cfg()
            return deep_update(cfg, {
                "grid": {"n_levels": 4, "hash_size": 12, "voxel_sdf": 0.1},
                "mapper": {"sample": 64, "iters": 2, "first_iters": 4,
                           "min_pixels_cur": 4,
                           "act_ray_num_uncert_sample": 8,
                           "voxel_size": 0.25},
                "training": {"n_samples_d": 8, "n_range_d": 5,
                             "smooth_pts": 4},
                "planner": {"gs_z_levels": [3, 4, 5],
                            "goal_repeat_penalty": 0.5},
                "general": {"result_dir": str(out), "ckpt_freq": 6},
            })

        a = Engine(build(tmp_path / "a"), quiet=True)
        a.run(num_iter=14)
        snap = os.path.join(str(tmp_path / "a"), "Replica", "office0",
                            "full_state_latest.pkl")
        assert os.path.exists(snap)
        saved_planner = a.planner.export_state()  # step-14 state, superset

        b = Engine(build(tmp_path / "b"), quiet=True)
        final = b.run(num_iter=14, resume_from=snap)
        assert final.shape == (4, 4)
        # resumed from the step-12 snapshot -> ran steps 13..13
        assert b.mapper.step == 13
        # planner FSM state was serialized (step-14 superset sanity)
        assert saved_planner["fsm"]["agg_key"] is not None
        # mapper rng key rode the checkpoint: drawing the next BA key in
        # b matches neither the fresh-init key nor crashes
        assert np.asarray(b.mapper._key).shape == (2,)
        # poses up to the snapshot step are bit-identical to run A's
        np.testing.assert_array_equal(
            np.asarray(b.mapper.state.poses)[:12],
            np.asarray(a.mapper.state.poses)[:12])

"""Tests for scripted simulation, replay, offline visualization, pose export."""
import os

import numpy as np
import pytest

from naruto_tpu.config import make_config
from naruto_tpu.config.schema import deep_update
from naruto_tpu.geometry.pose import (
    coslam_mp3d2habitat, coslam_replica2habitat, habitat_pose_conversion,
)
from naruto_tpu.sim import init_simulator
from naruto_tpu.sim.scripted import (
    generate_motion_profile, run_scripted_simulation,
)

BOUND = ((-1.5, 1.5), (-1.5, 1.5), (-1.0, 1.0))


def small_cfg(tmp):
    cfg = make_config("Replica", "office0", num_iter=5)
    return deep_update(cfg, {
        "cam": {"H": 20, "W": 24, "fx": 15.0, "fy": 15.0, "cx": 11.5,
                "cy": 9.5},
        "sim": {"method": "analytic", "pinhole_hw": (20, 24),
                "erp_hw": (12, 24)},
        "mapper": {"bound": BOUND, "marching_cubes_bound": BOUND},
        "general": {"result_dir": str(tmp)},
    })


class TestPoseConversions:
    def test_replica_involution(self):
        rng = np.random.default_rng(0)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = q
        T[:3, 3] = rng.normal(size=3)
        # applying the replica flip twice returns the original
        np.testing.assert_allclose(
            coslam_replica2habitat(coslam_replica2habitat(T)), T, atol=1e-6)

    def test_mp3d_preserves_rigidity(self):
        rng = np.random.default_rng(1)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = q * np.sign(np.linalg.det(q))
        out = coslam_mp3d2habitat(T)
        R = out[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_dispatch(self):
        T = np.eye(4, dtype=np.float32)
        np.testing.assert_allclose(
            habitat_pose_conversion(T, "coslam_naruto2habitat"), T)
        with pytest.raises(NotImplementedError):
            habitat_pose_conversion(T, "nope")


class TestMotionProfiles:
    def test_all_profiles_produce_valid_poses(self):
        start = np.eye(4, dtype=np.float32)
        for profile in ("stationary", "forward", "spiral_forward", "random"):
            poses = generate_motion_profile(profile, 8, start, seed=1)
            assert len(poses) == 8
            for p in poses:
                R = p[:3, :3]
                np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    def test_forward_moves_forward(self):
        start = np.eye(4, dtype=np.float32)
        poses = generate_motion_profile("forward", 5, start)
        assert poses[4][2, 3] > poses[0][2, 3]

    def test_predefined(self):
        ps = [np.eye(4)] * 3
        out = generate_motion_profile("predefined", 3, np.eye(4),
                                      predefined=ps)
        assert len(out) == 3


class TestScriptedAndReplay:
    def test_scripted_then_replay_roundtrip(self, tmp_path):
        cfg = small_cfg(tmp_path)
        sim = init_simulator(cfg)
        poses = generate_motion_profile("stationary", 3,
                                        np.eye(4, dtype=np.float32))
        out_dir = str(tmp_path / "export")
        run_scripted_simulation(sim, poses, out_dir)
        assert os.path.exists(os.path.join(out_dir, "traj.txt"))
        assert os.path.exists(os.path.join(out_dir, "results",
                                           "frame000000.jpg"))
        # replay the exported data
        cfg2 = deep_update(cfg, {"sim": {"method": "replay",
                                         "scene_path": out_dir}})
        replay = init_simulator(cfg2)
        replay.update_step(0)
        color, depth = replay.simulate(np.eye(4))
        assert color.shape == (20, 24, 3)
        # depth survives the png quantization
        ref_color, ref_depth = sim.simulate(np.eye(4, dtype=np.float32))
        np.testing.assert_allclose(depth, np.asarray(ref_depth), atol=0.01)


class TestOfflineViz:
    def test_traj_plot_and_video(self, tmp_path):
        from naruto_tpu.visualization.offline import (
            make_video, plot_trajectory,
        )
        import cv2

        run_dir = tmp_path / "visualization"
        (run_dir / "pose").mkdir(parents=True)
        (run_dir / "rgbd").mkdir()
        for i in range(4):
            T = np.eye(4)
            T[:3, 3] = [i * 0.1, 0, 0]
            np.save(run_dir / "pose" / f"{i:04d}.npy", T)
            img = np.full((20, 40, 3), i * 40, np.uint8)
            cv2.imwrite(str(run_dir / "rgbd" / f"{i:04d}.png"), img)
        out_png = str(tmp_path / "traj.png")
        plot_trajectory(str(run_dir), out_png)
        assert os.path.getsize(out_png) > 0
        out_mp4 = str(tmp_path / "v.mp4")
        make_video(str(run_dir), out_mp4)
        assert os.path.getsize(out_mp4) > 0

    def test_replay_3d(self, tmp_path):
        """3D scene replay (naruto_o3d_visualizer parity): mesh + frusta +
        path + look-at overlays rendered per step."""
        import cv2

        from naruto_tpu.mesh.ply import write_ply
        from naruto_tpu.visualization.offline import replay

        run_dir = tmp_path / "visualization"
        for sub in ("pose", "color_mesh", "planning_path", "lookat_tgts",
                    "state"):
            (run_dir / sub).mkdir(parents=True)

        # a colored box mesh snapshot at step 0
        lo, hi = np.array([-1.0, -1, -1]), np.array([1.0, 1, 1])
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1])
                            for z in (lo[2], hi[2])], np.float32)
        quads = [(0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4), (2, 3, 7, 6),
                 (0, 2, 6, 4), (1, 3, 7, 5)]
        faces = []
        for a, b, c, d in quads:
            faces += [[a, b, c], [a, c, d]]
        write_ply(str(run_dir / "color_mesh" / "0000.ply"), corners,
                  np.asarray(faces, np.int32), (corners - lo) / 2.0)

        for i in range(3):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [i * 0.1, 0, 0]
            np.save(run_dir / "pose" / f"{i:04d}.npy", T)
            np.save(run_dir / "planning_path" / f"{i:04d}.npy",
                    np.asarray([[0, 0, 0], [0.5, 0, 0]], np.float32))
            np.save(run_dir / "lookat_tgts" / f"{i:04d}.npy",
                    np.asarray([[0.9, 0.9, 0.0]], np.float32))
            with open(run_dir / "state" / f"{i:04d}.txt", "w") as f:
                f.write("movingToGoal")

        out_dir = str(tmp_path / "replay")
        mp4 = str(tmp_path / "replay.mp4")
        outs = replay(str(run_dir), out_dir, H=120, W=160, video_path=mp4)
        assert len(outs) == 3
        img = cv2.imread(outs[0])
        assert img is not None and img.shape == (120, 160, 3)
        assert img.max() > 30          # mesh visible, not a black frame
        assert os.path.getsize(mp4) > 0


def test_pose_export_cli(tmp_path):
    import pickle
    from naruto_tpu import export_pose

    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    ckpt = str(tmp_path / "c.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump({"params": {}, "poses": poses, "step": 4}, f)
    out = str(tmp_path / "p.npy")
    export_pose.main(["--ckpt", ckpt, "--out", out, "--num", "3"])
    assert np.load(out).shape == (3, 4, 4)


class TestRigs:
    def test_orientations_are_rotations(self):
        from naruto_tpu.sim.rigs import rig_orientations
        for kind in ("mono", "skybox", "horizontal", "horizontal+UpDown"):
            for name, R in rig_orientations(kind):
                np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert len(rig_orientations("skybox")) == 6
        assert len(rig_orientations("horizontal", 3)) == 3

    def test_render_rig_views_differ(self, tmp_path):
        from naruto_tpu.sim.rigs import render_rig
        cfg = small_cfg(tmp_path)
        sim = init_simulator(cfg)
        views = render_rig(sim, np.eye(4), kind="skybox")
        assert set(views) == {"front", "right", "back", "left", "up",
                              "down"}
        d_front = np.asarray(views["front"][1])
        d_up = np.asarray(views["up"][1])
        assert np.abs(d_front - d_up).max() > 0.05

    def test_stereo_offsets(self, tmp_path):
        from naruto_tpu.sim.rigs import render_rig
        cfg = small_cfg(tmp_path)
        sim = init_simulator(cfg)
        views = render_rig(sim, np.eye(4), kind="mono", stereo_baseline=0.3)
        assert set(views) == {"left_front", "right_front"}


class TestPassivePrefetch:
    def test_passive_mapping_with_prefetch(self, tmp_path):
        """Export a short scripted trajectory, then run the engine in
        PASSIVE mode (replay + double-buffered prefetch) over it."""
        cfg = small_cfg(tmp_path)
        sim = init_simulator(cfg)
        poses = generate_motion_profile("stationary", 8,
                                        np.eye(4, dtype=np.float32))
        data_dir = str(tmp_path / "data")
        run_scripted_simulation(sim, poses, data_dir)

        cfg2 = deep_update(cfg, {
            "sim": {"method": "replay", "scene_path": data_dir},
            "grid": {"n_levels": 4, "hash_size": 12, "voxel_sdf": 0.1},
            "mapper": {"sample": 64, "iters": 2, "first_iters": 4,
                       "min_pixels_cur": 4, "act_ray_num_uncert_sample": 8,
                       "voxel_size": 0.25},
            "training": {"n_samples_d": 8, "n_range_d": 5, "smooth_pts": 4},
            "general": {"num_iter": 8},
        })
        cfg2 = cfg2.replace(enable_active_planning=False,
                            use_traj_pose=True)
        from naruto_tpu.system.engine import Engine

        eng = Engine(cfg2, quiet=True)
        calls = []
        orig = eng.sim.simulate
        eng.sim.simulate = (
            lambda c2w, **kw: (calls.append(1), orig(c2w, **kw))[1])
        final = eng.run()
        # passive: final pose equals the trajectory's last pose
        np.testing.assert_allclose(final, poses[7], atol=1e-5)
        assert int(eng.mapper.state.kf.count) >= 2
        # without a visualizer the prefetcher renders only consumed frames
        # (mapping/keyframe cadence + one lookahead past the horizon)
        me, ke = cfg2.mapper.map_every, cfg2.mapper.keyframe_every
        needed = sum(1 for i in range(8)
                     if i == 0 or i % me == 0 or i % ke == 0)
        assert len(calls) <= needed + 1
        assert len(calls) < 8


def test_native_build_stamp_rebuilds_on_content_change(tmp_path, monkeypatch):
    """ensure_built must rebuild when SOURCE CONTENT changes even if the
    output binary carries a newer mtime — the exact failure mode of a fresh
    git checkout over a committed stale .so (round 5: the SAH raycaster
    rewrite was silently shadowed; symbol rc_probe_erp missing)."""
    from naruto_tpu.native import build

    src = tmp_path / "toy.cpp"
    src.write_text('extern "C" int toy_v() { return 1; }\n')
    monkeypatch.setattr(build, "NATIVE_DIR", tmp_path)
    monkeypatch.setitem(build.SOURCES, "toy", ["toy.cpp"])

    import ctypes

    lib_path = build.ensure_built("toy")
    assert ctypes.CDLL(lib_path).toy_v() == 1

    # Rewrite the source, then FORCE the stale binary to look newer
    # (checkout semantics). The hash stamp must still trigger a rebuild.
    # (dlopen caches handles by path, so the recompile is observed via the
    # binary's bytes, not a second CDLL load.)
    src.write_text('extern "C" int toy_v() { return 2; }\n')
    out = build.lib_path("toy")
    bytes_v1 = out.read_bytes()
    stale_future = out.stat().st_mtime + 3600
    os.utime(out, (stale_future, stale_future))
    build.ensure_built("toy")
    assert out.read_bytes() != bytes_v1

    # And a second call with nothing changed is a cache hit (no recompile:
    # the stamp file's mtime is the cheap observable).
    stamp = tmp_path / ".toy.stamp"
    t0 = stamp.stat().st_mtime
    build.ensure_built("toy")
    assert stamp.stat().st_mtime == t0

"""C++ BVH raycaster tests against analytic expectations."""
import numpy as np
import pytest

from naruto_tpu.config import make_config
from naruto_tpu.config.schema import deep_update


def box_mesh(lo, hi):
    """Closed axis-aligned box (inward-facing triangles not required —
    raycaster is double-sided). Vertex colors encode position."""
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    corners = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                        [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                        [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                        [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]],
                       dtype=np.float32)
    quads = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4), (2, 3, 7, 6),
             (1, 2, 6, 5), (0, 3, 7, 4)]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    colors = (corners - lo) / (hi - lo)
    return corners, np.asarray(faces, np.int32), colors.astype(np.float32)


@pytest.fixture(scope="module")
def sim():
    from naruto_tpu.sim.raycast import RaycastSimulator

    cfg = make_config("Replica", "office0", num_iter=10)
    cfg = deep_update(cfg, {
        "cam": {"H": 40, "W": 60, "fx": 30.0, "fy": 30.0, "cx": 29.5,
                "cy": 19.5},
        "sim": {"method": "raycast", "pinhole_hw": (40, 60),
                "erp_hw": (32, 64)},
    })
    v, f, c = box_mesh([-2, -2, -2], [2, 2, 2])
    return RaycastSimulator(cfg, verts=v, faces=f, colors=c)


class TestRaycast:
    def test_pinhole_depth(self, sim):
        c2w = np.eye(4, dtype=np.float32)
        color, depth = sim.simulate(c2w)
        assert depth.shape == (40, 60)
        # wall straight ahead at z=2
        np.testing.assert_allclose(depth[20, 30], 2.0, atol=0.02)
        # z-depth constant across the facing wall
        assert abs(depth[20, 35] - depth[20, 25]) < 0.02
        assert (depth > 0).all()  # closed box: everything hits

    def test_vertex_colors_interpolated(self, sim):
        c2w = np.eye(4, dtype=np.float32)
        color, _ = sim.simulate(c2w)
        # center of +z face: x,y centered -> r~0.5, g~0.5, b=1
        np.testing.assert_allclose(color[20, 30], [0.5, 0.5, 1.0], atol=0.05)

    def test_pose_translation(self, sim):
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 1.0  # move 1m toward the +z wall
        _, depth = sim.simulate(c2w)
        np.testing.assert_allclose(depth[20, 30], 1.0, atol=0.02)

    def test_erp_distances(self, sim):
        c2w = np.eye(4, dtype=np.float32)
        _, _, erp_color, erp_dist = sim.simulate(c2w, return_erp=True)
        assert erp_dist.shape == (32, 64)
        assert (erp_dist < 1e6).all()  # closed box, no misses
        # forward pixel distance = 2; diagonal pixels farther
        np.testing.assert_allclose(erp_dist[16, 32], 2.0, atol=0.05)
        assert erp_dist.max() <= np.sqrt(12) + 0.1  # corner distance

    def test_erp_rotation_consistency(self, sim):
        from scipy.spatial.transform import Rotation

        c2w = np.eye(4, dtype=np.float32)
        c2w2 = np.eye(4, dtype=np.float32)
        c2w2[:3, :3] = Rotation.from_euler("y", 90, degrees=True).as_matrix()
        _, _, _, d1 = sim.simulate(c2w, return_erp=True)
        _, _, _, d2 = sim.simulate(c2w2, return_erp=True)
        # rotating the camera 90 deg shifts the ERP by W/4 columns
        shift = 64 // 4
        row1 = d1[16]
        row2 = np.roll(d2[16], shift)
        np.testing.assert_allclose(row1, row2, atol=0.1)


class TestDynamicObjects:
    """Dynamic rigid objects in the C++ backend — parity with the
    reference's object profiles (habitat_utils.py:342-426)."""

    def _make_sim(self, objects, physics_dt=0.0):
        from naruto_tpu.sim.raycast import RaycastSimulator

        cfg = make_config("Replica", "office0", num_iter=10)
        cfg = deep_update(cfg, {
            "cam": {"H": 40, "W": 60, "fx": 30.0, "fy": 30.0, "cx": 29.5,
                    "cy": 19.5},
            "sim": {"method": "raycast", "pinhole_hw": (40, 60),
                    "erp_hw": (16, 32), "objects": objects,
                    "physics_dt": physics_dt},
            "start_c2w": None,
        })
        v, f, c = box_mesh([-3, -3, -3], [3, 3, 3])
        return RaycastSimulator(cfg, verts=v, faces=f, colors=c)

    def test_static_object_occludes_wall(self):
        # sphere 1.5m in front of the camera (start frame = identity)
        sim = self._make_sim([{"template": "sphere:0.3",
                               "location": [0, 0, 1.5]}])
        _, depth = sim.simulate(np.eye(4, dtype=np.float32))
        # center pixel hits the sphere front (1.2m), not the wall (3m)
        np.testing.assert_allclose(depth[20, 30], 1.2, atol=0.05)
        # corner pixel still sees the wall
        assert depth[0, 0] > 2.0

    def test_moving_object_across_frames(self):
        # sphere starts in front, moves +x at 0.5 m/s, 1/5 s per frame;
        # spawn includes the reference's initial 1.0 s physics settle
        sim = self._make_sim([{"template": "sphere:0.3",
                               "location": [0, 0, 1.5],
                               "velocity": [0.5, 0, 0]}],
                             physics_dt=0.2)
        c2w = np.eye(4, dtype=np.float32)
        _, d0 = sim.simulate(c2w)
        # after settle the sphere center is at x=+0.5 -> center pixel sees
        # the wall again, a right-side pixel sees the sphere
        assert d0[20, 30] > 2.5
        u_off = int(round(0.5 / 1.5 * 30))  # x/z * fx
        assert d0[20, 30 + u_off] < 2.0
        for i in range(1, 11):
            sim.update_step(i)
        _, d1 = sim.simulate(c2w)
        # 10 steps x 0.2s x 0.5 m/s = +1.0m more; the old spot clears
        assert d1[20, 30 + u_off] > 2.5

    def test_gravity_settles_to_support(self):
        """With sim.gravity > 0, the initial 1.0 s settle drops an object
        to its first support along world -z (one-raycast approximation of
        the reference's Bullet settle, habitat_simulator.py:76-79)."""
        from naruto_tpu.sim.raycast import RaycastSimulator

        cfg = make_config("Replica", "office0", num_iter=10)
        cfg = deep_update(cfg, {
            "cam": {"H": 40, "W": 60, "fx": 30.0, "fy": 30.0, "cx": 29.5,
                    "cy": 19.5},
            "sim": {"method": "raycast", "pinhole_hw": (40, 60),
                    "erp_hw": (16, 32), "gravity": 10.0,
                    "objects": [{"template": "sphere:0.3",
                                 "location": [0, 0, 1.5]}]},
            "start_c2w": None,
        })
        v, f, c = box_mesh([-3, -3, -3], [3, 3, 3])
        sim = RaycastSimulator(cfg, verts=v, faces=f, colors=c)
        st = sim._obj_states[0]
        # sphere (r=0.3) rests on the floor at z=-3 -> center at -2.7
        np.testing.assert_allclose(st["pos"][2], -2.7, atol=0.01)
        assert st["vel"][2] == 0.0
        # a camera at the start pose no longer sees it at eye level
        _, depth = sim.simulate(np.eye(4, dtype=np.float32))
        assert depth[20, 30] > 2.5

    def test_update_step_exactly_once_per_index(self):
        """update_step integrates exactly one physics tick per step INDEX
        (monotonic + idempotent): repeated calls are no-ops and a
        prefetch-ahead call covers the intermediate indices. Guards the
        passive-prefetch double-advance bug (the worker thread and the
        engine both called update_step per step, doubling the physics
        rate)."""
        sim = self._make_sim([{"template": "sphere:0.3",
                               "location": [0, 0, 1.5],
                               "velocity": [0.5, 0, 0]}],
                             physics_dt=0.2)
        x0 = float(sim._obj_states[0]["pos"][0])    # post-settle
        sim.update_step(3)                          # jump: ticks 1..3
        x3 = float(sim._obj_states[0]["pos"][0])
        np.testing.assert_allclose(x3 - x0, 3 * 0.2 * 0.5, atol=1e-5)
        for i in (1, 2, 3, 3):                      # replays: all no-ops
            sim.update_step(i)
        np.testing.assert_allclose(
            float(sim._obj_states[0]["pos"][0]), x3, atol=1e-7)
        sim.update_step(4)                          # next index: one tick
        np.testing.assert_allclose(
            float(sim._obj_states[0]["pos"][0]) - x3, 0.1, atol=1e-5)

    def test_gravity_no_tunneling_per_frame(self):
        """Per-frame stepping (the reference's 1/30 s cadence): the contact
        check must include the ACCUMULATED fall velocity's displacement —
        clamping only the per-step 0.5*g*dt^2 term while pos += vel*dt
        applied vel_z unconditionally let fast-falling objects pass through
        the floor (support raycast then misses from below -> falls forever)."""
        from naruto_tpu.sim.raycast import RaycastSimulator

        cfg = make_config("Replica", "office0", num_iter=10)
        cfg = deep_update(cfg, {
            "cam": {"H": 40, "W": 60, "fx": 30.0, "fy": 30.0, "cx": 29.5,
                    "cy": 19.5},
            "sim": {"method": "raycast", "pinhole_hw": (40, 60),
                    "erp_hw": (16, 32), "gravity": 10.0,
                    "objects": [{"template": "sphere:0.3",
                                 "location": [0, 0, 1.5]}]},
            "start_c2w": None,
        })
        v, f, c = box_mesh([-3, -3, -3], [3, 3, 3])
        sim = RaycastSimulator(cfg, verts=v, faces=f, colors=c)
        st = sim._obj_states[0]
        # re-drop after the constructor settle, then step at 30 Hz: the
        # fall accrues ~0.33 m/frame of vel_z displacement by contact time
        st["pos"] = np.array([0.0, 0.0, 1.5], np.float32)
        st["vel"] = np.zeros(3, np.float32)
        sim._set_pose_from_state(st)
        for _ in range(120):                    # 4 s; free fall needs ~1 s
            sim.step_physics(1.0 / 30.0)
        np.testing.assert_allclose(st["pos"][2], -2.7, atol=0.02)
        assert st["vel"][2] == 0.0

    def test_object_rotation_profile(self):
        # a thin box rotated 90 deg about y occludes differently
        sim_plain = self._make_sim([{"template": "box:0.8,0.8,0.05",
                                     "location": [0, 0, 1.5]}])
        sim_rot = self._make_sim([{"template": "box:0.8,0.8,0.05",
                                   "location": [0, 0, 1.5],
                                   "rotation": [90, 0, 1, 0]}])
        _, dp = sim_plain.simulate(np.eye(4, dtype=np.float32))
        _, dr = sim_rot.simulate(np.eye(4, dtype=np.float32))
        # face-on: broad occluder near 1.475; edge-on: center ray passes
        # through the thin edge region occupying few pixels
        assert (dp[15:25, 20:40] < 2.0).mean() > 0.7
        assert (dr[15:25, 20:40] < 2.0).mean() < 0.3


class TestSimdParity:
    """The r5 renderer tests 8-wide SoA triangle blocks with vectorized
    Moller-Trumbore; rc_set_force_scalar switches the SAME BVH to a strict
    scalar per-lane loop. Both paths must produce pixel-exact output
    (VERDICT r4 next-step #2)."""

    def _render_both(self, sim, c2w):
        import ctypes

        out = []
        for flag in (0, 1):
            sim._lib.rc_set_force_scalar(sim._handle, ctypes.c_int(flag))
            out.append(sim.simulate(c2w, return_erp=True))
        sim._lib.rc_set_force_scalar(sim._handle, ctypes.c_int(0))
        return out

    def test_simd_matches_scalar_exactly(self, sim):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(7)
        for k in range(4):
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :3] = Rotation.from_euler(
                "xyz", rng.uniform(-180, 180, 3), degrees=True
            ).as_matrix()
            c2w[:3, 3] = rng.uniform(-1.2, 1.2, 3)
            (c_s, d_s, ec_s, ed_s), (c_r, d_r, ec_r, ed_r) = \
                self._render_both(sim, c2w)
            np.testing.assert_array_equal(d_s, d_r)
            np.testing.assert_array_equal(c_s, c_r)
            np.testing.assert_array_equal(ed_s, ed_r)
            np.testing.assert_array_equal(ec_s, ec_r)

    def test_probe_erp_matches_render(self, sim):
        """rc_probe_erp (distance-only, used by collision probes) is
        bit-identical to the full ERP render's distance channel."""
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = (0.3, -0.2, 0.5)
        _, _, _, erp_dist = sim.simulate(c2w, return_erp=True)
        probe = sim.probe_erp_dist(c2w)
        np.testing.assert_array_equal(probe, erp_dist)

    def test_large_random_mesh_parity(self):
        """Deeper BVH (SAH + median fallbacks) on an irregular triangle
        soup: SIMD and scalar leaf paths still agree exactly, and every
        reported hit is a real triangle index."""
        from naruto_tpu.sim.raycast import RaycastSimulator
        import ctypes

        cfg = make_config("Replica", "office0", num_iter=10)
        cfg = deep_update(cfg, {
            "cam": {"H": 24, "W": 32, "fx": 16.0, "fy": 16.0, "cx": 15.5,
                    "cy": 11.5},
            "sim": {"method": "raycast", "pinhole_hw": (24, 32),
                    "erp_hw": (16, 32)},
        })
        rng = np.random.default_rng(3)
        centers = rng.uniform(-3, 3, (600, 3)).astype(np.float32)
        a = centers + rng.normal(0, 0.2, centers.shape).astype(np.float32)
        b = centers + rng.normal(0, 0.2, centers.shape).astype(np.float32)
        c = centers + rng.normal(0, 0.2, centers.shape).astype(np.float32)
        verts = np.concatenate([a, b, c]).astype(np.float32)
        n = len(centers)
        faces = np.stack([np.arange(n), np.arange(n) + n,
                          np.arange(n) + 2 * n], axis=1).astype(np.int32)
        colors = rng.uniform(0, 1, (3 * n, 3)).astype(np.float32)
        sim = RaycastSimulator(cfg, verts=verts, faces=faces, colors=colors)
        c2w = np.eye(4, dtype=np.float32)
        sim._lib.rc_set_force_scalar(sim._handle, ctypes.c_int(0))
        col_s, dep_s = sim.simulate(c2w)
        sim._lib.rc_set_force_scalar(sim._handle, ctypes.c_int(1))
        col_r, dep_r = sim.simulate(c2w)
        np.testing.assert_array_equal(dep_s, dep_r)
        np.testing.assert_array_equal(col_s, col_r)
        assert (dep_s > 0).any()  # soup is dense enough that rays hit


class TestWallContact:
    def test_velocity_profile_stops_at_wall(self):
        """Contact response for driven motion (habitat's Bullet stops
        objects at scene geometry, habitat_simulator.py:66-79): a velocity
        profile aimed at a wall comes to rest just short of it instead of
        tunneling through."""
        from naruto_tpu.config import make_config
        from naruto_tpu.config.schema import deep_update
        from naruto_tpu.sim.raycast import RaycastSimulator

        cfg = make_config("Replica", "office0", num_iter=10)
        cfg = deep_update(cfg, {
            "cam": {"H": 40, "W": 60, "fx": 30.0, "fy": 30.0, "cx": 29.5,
                    "cy": 19.5},
            "sim": {"method": "raycast", "pinhole_hw": (40, 60),
                    "erp_hw": (16, 32),
                    "objects": [{"template": "sphere:0.3",
                                 "location": [0, 0, 1.5],
                                 "velocity": [1.0, 0, 0]}]},
            "start_c2w": None,
        })
        v, f, c = box_mesh([-3, -3, -3], [3, 3, 3])
        sim = RaycastSimulator(cfg, verts=v, faces=f, colors=c)
        st = sim._obj_states[0]
        for _ in range(40):                     # 8 m of driven motion
            sim.step_physics(0.2)
        # sphere radius 0.3: center rests at x ~= 3 - 0.3, never beyond
        assert st["pos"][0] < 3.0
        np.testing.assert_allclose(st["pos"][0], 2.7, atol=0.05)
        assert np.linalg.norm(st["vel"]) == 0.0  # at rest after contact

    def test_gravity_fall_keeps_horizontal_contact(self):
        """Same contact under gravity: horizontal velocity into a wall
        stops while the vertical settle still lands on the floor."""
        from naruto_tpu.config import make_config
        from naruto_tpu.config.schema import deep_update
        from naruto_tpu.sim.raycast import RaycastSimulator

        cfg = make_config("Replica", "office0", num_iter=10)
        cfg = deep_update(cfg, {
            "cam": {"H": 40, "W": 60, "fx": 30.0, "fy": 30.0, "cx": 29.5,
                    "cy": 19.5},
            "sim": {"method": "raycast", "pinhole_hw": (40, 60),
                    "erp_hw": (16, 32), "gravity": 10.0,
                    "objects": [{"template": "sphere:0.3",
                                 "location": [0, 0, 1.5],
                                 "velocity": [2.0, 0, 0]}]},
            "start_c2w": None,
        })
        v, f, c = box_mesh([-3, -3, -3], [3, 3, 3])
        sim = RaycastSimulator(cfg, verts=v, faces=f, colors=c)
        st = sim._obj_states[0]
        for _ in range(90):                     # 3 s at 30 Hz
            sim.step_physics(1.0 / 30.0)
        assert st["pos"][0] < 3.0
        np.testing.assert_allclose(st["pos"][0], 2.7, atol=0.05)
        np.testing.assert_allclose(st["pos"][2], -2.7, atol=0.05)

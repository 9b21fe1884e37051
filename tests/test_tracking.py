"""Pose representation + tracking tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from naruto_tpu.config.schema import deep_update
from naruto_tpu.mapping.mapper import Mapper
from naruto_tpu.mapping.pose_opt import (
    axis_angle_to_matrix, const_speed_init, matrix_from_tensor,
    matrix_to_axis_angle, pose_to_tensor,
)


class TestAxisAngle:
    def test_matches_scipy(self, rng):
        for _ in range(10):
            r = rng.normal(size=3) * 1.5
            R_ref = Rotation.from_rotvec(r).as_matrix()
            R = np.asarray(axis_angle_to_matrix(jnp.asarray(r, jnp.float32)))
            np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_roundtrip(self, rng):
        for _ in range(10):
            r = rng.normal(size=3)
            R = axis_angle_to_matrix(jnp.asarray(r, jnp.float32))
            r2 = np.asarray(matrix_to_axis_angle(R))
            np.testing.assert_allclose(r2, r, atol=1e-4)

    def test_zero_rotation(self):
        R = axis_angle_to_matrix(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        r = matrix_to_axis_angle(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)

    def test_differentiable(self):
        g = jax.grad(lambda r: jnp.sum(axis_angle_to_matrix(r)))(
            jnp.asarray([0.1, 0.2, 0.3]))
        assert np.all(np.isfinite(np.asarray(g)))
        # differentiable at zero too
        g0 = jax.grad(lambda r: jnp.sum(axis_angle_to_matrix(r) ** 2))(
            jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g0)))

    def test_pose_tensor_roundtrip(self, rng):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        q = q * np.sign(np.linalg.det(q))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = q
        T[:3, 3] = rng.normal(size=3)
        rot, trans = pose_to_tensor(jnp.asarray(T))
        T2 = matrix_from_tensor(rot[None], trans[None])[0]
        np.testing.assert_allclose(np.asarray(T2), T, atol=1e-5)

    def test_const_speed(self):
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, 3] = [1, 0, 0]
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, 3] = [2, 0, 0]
        T3 = const_speed_init(jnp.asarray(T2), jnp.asarray(T1))
        np.testing.assert_allclose(np.asarray(T3)[:3, 3], [3, 0, 0],
                                   atol=1e-5)


class TestTracking:
    def test_tracking_recovers_pose(self):
        """Train a tiny field on a wall frame at identity, then track a
        slightly perturbed init back toward identity."""
        from tests.test_mapping import tiny_cfg, _render_wall_frame

        cfg = tiny_cfg()
        cfg = deep_update(cfg, {
            "mapper": {"tracking_enable": True, "track_sample": 128,
                       "track_iter": 20, "track_ignore_edge_w": 2,
                       "track_ignore_edge_h": 2,
                       "lr_rot": 3e-3, "lr_trans": 3e-3,
                       "first_iters": 60}})
        mapper = Mapper(cfg)
        color, depth = _render_wall_frame(cfg)
        c2w = np.eye(4, dtype=np.float32)
        mapper.online_recon_step(0, color, depth, c2w)

        frame_rays = mapper.frame_to_rays(color, depth)
        init = np.eye(4, dtype=np.float32)
        init[0, 3] = 0.05  # 5cm off
        est = np.asarray(mapper._track_jit(
            mapper.state, frame_rays, jnp.asarray(init),
            jax.random.PRNGKey(0)))
        err_init = np.linalg.norm(init[:3, 3])
        err_est = np.linalg.norm(est[:3, 3])
        assert err_est < err_init  # moved toward the true pose

    def test_ba_with_pose_optim_runs(self):
        from tests.test_mapping import tiny_cfg, _render_wall_frame

        cfg = tiny_cfg()
        cfg = deep_update(cfg, {"mapper": {"tracking_enable": True,
                                           "track_sample": 64,
                                           "track_iter": 2,
                                           "track_ignore_edge_w": 2,
                                           "track_ignore_edge_h": 2,
                                           "first_iters": 4}})
        mapper = Mapper(cfg)
        color, depth = _render_wall_frame(cfg)
        c2w = np.eye(4, dtype=np.float32)
        for i in range(6):
            mapper.update_step(i)
            mapper.online_recon_step(i, color, depth, c2w)
        # poses stay finite and close to identity (GT data is static)
        p5 = np.asarray(mapper.state.poses[5])
        assert np.all(np.isfinite(p5))
        assert np.linalg.norm(p5[:3, 3]) < 0.5

"""Mapping tests: field, renderer, losses, keyframes, mapper end-to-end on a
tiny synthetic scene (flat wall at z=1 in front of the camera)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naruto_tpu.config import make_config
from naruto_tpu.config.schema import deep_update
from naruto_tpu.mapping.field import (
    FieldSpec, field_query, init_field_params, query_sdf, normalize_world,
)
from naruto_tpu.mapping.keyframes import (
    add_keyframe, init_keyframe_db, sample_global_rays,
)
from naruto_tpu.mapping.losses import LossWeights, sdf_losses, total_loss
from naruto_tpu.mapping.mapper import Mapper
from naruto_tpu.mapping.render import RenderConfig, sample_z_vals, sdf2weights


BOUND = ((-2.0, 2.0), (-2.0, 2.0), (-2.0, 2.0))


def tiny_spec(**kw):
    d = dict(bound=BOUND, n_levels=4, log2_hashmap_size=12,
             base_resolution=8, voxel_sdf=0.1, uncert_voxel_size=0.5)
    d.update(kw)
    return FieldSpec(**d)


def tiny_cfg(**mapper_over):
    cfg = make_config("Replica", "office0", num_iter=40)
    over = {
        "cam": {"H": 24, "W": 32, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                "cy": 11.5, "far": 5.0},
        "grid": {"n_levels": 4, "hash_size": 12, "voxel_sdf": 0.1},
        "mapper": {"sample": 64, "iters": 3, "first_iters": 5,
                   "min_pixels_cur": 4, "act_ray_num_uncert_sample": 8,
                   "bound": BOUND, "marching_cubes_bound": BOUND,
                   "voxel_size": 0.5, **mapper_over},
        "training": {"n_samples_d": 8, "n_range_d": 5, "smooth_pts": 4},
    }
    return deep_update(cfg, over)


class TestField:
    def test_shapes(self):
        spec = tiny_spec()
        params = init_field_params(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
        raw = field_query(params, x, spec)
        assert raw.shape == (32, 5)

    def test_uncert_init_value(self):
        spec = tiny_spec()
        params = init_field_params(jax.random.PRNGKey(0), spec)
        assert params["uncert_grid"].shape == spec.uncert_shape
        np.testing.assert_allclose(np.asarray(params["uncert_grid"]), 3.0)
        # interior query returns ~3.0 through the sampler
        x = jnp.array([[0.5, 0.5, 0.5]])
        raw = field_query(params, x, spec)
        np.testing.assert_allclose(float(raw[0, 4]), 3.0, atol=1e-5)

    def test_query_sdf_uncert(self):
        spec = tiny_spec()
        params = init_field_params(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
        sdf, u = query_sdf(params, x, spec, with_uncert=True)
        assert sdf.shape == (8,) and u.shape == (8,)

    def test_normalize_world(self):
        spec = tiny_spec()
        pts = jnp.array([[0.0, 0.0, 0.0], [-2.0, -2.0, -2.0]])
        x01 = normalize_world(pts, spec)
        np.testing.assert_allclose(np.asarray(x01),
                                   [[0.5, 0.5, 0.5], [0, 0, 0]], atol=1e-6)


class TestRender:
    def test_z_sampling_shape_and_depth_guidance(self):
        rc = RenderConfig(n_range_d=5, n_samples_d=8, perturb=0.0)
        d = jnp.array([[2.0], [0.0]])
        z = sample_z_vals(jax.random.PRNGKey(0), d, rc)
        assert z.shape == (2, 13)
        # depth-guided ray has samples within +-0.1 of depth 2.0
        assert np.any(np.abs(np.asarray(z[0]) - 2.0) < 0.11)
        # invalid-depth ray falls back to near..far
        assert np.asarray(z[1]).max() <= rc.far + 1e-6
        # sorted
        assert np.all(np.diff(np.asarray(z), axis=-1) >= 0)

    def test_sdf2weights_peak_at_surface(self):
        rc = RenderConfig(trunc=0.1)
        z = jnp.linspace(0.0, 2.0, 40)[None, :]  # grid avoids sdf==0 exactly
        sdf = (1.0 - z) / rc.trunc  # surface at z=1, sdf in trunc units
        w = sdf2weights(sdf, z, rc)
        w = np.asarray(w)[0]
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
        assert abs(float(z[0, w.argmax()]) - 1.0) < 0.06

    def test_sdf2weights_first_surface_only(self):
        rc = RenderConfig(trunc=0.1)
        z = jnp.linspace(0.0, 3.0, 61)[None, :]
        # two surfaces: z=1 and z=2; weights beyond first crossing + trunc = 0
        sdf = jnp.minimum(1.0 - z, jnp.abs(z - 2.0) + 0.01) / rc.trunc
        w = np.asarray(sdf2weights(sdf, z, rc))[0]
        beyond = np.asarray(z)[0] > 1.0 + rc.trunc
        assert w[beyond].max() == 0.0


class TestLosses:
    def test_sdf_losses_zero_for_perfect_field(self):
        lw = LossWeights()
        n, s = 4, 16
        z = jnp.broadcast_to(jnp.linspace(0.5, 1.5, s), (n, s))
        d = jnp.full((n, 1), 1.0)
        perfect_sdf = (d - z) / lw.trunc  # z + sdf*trunc == d exactly
        mask = jnp.ones((n,))
        fs, sd = sdf_losses(perfect_sdf, z, d, mask, lw)
        assert float(sd) < 1e-10
        # free-space region here is z < 0.9: sdf=(1-z)/0.1 > 1 there -> fs>0
        assert float(fs) >= 0

    def test_padding_invariance(self):
        """Losses must be identical with and without padded rays."""
        spec = tiny_spec()
        params = init_field_params(jax.random.PRNGKey(0), spec)
        rc = RenderConfig(n_range_d=5, n_samples_d=8, perturb=0.0)
        lw = LossWeights(smooth=0.0)
        from naruto_tpu.mapping.render import render_rays

        key = jax.random.PRNGKey(7)
        n = 8
        rays_o = jnp.zeros((n, 3))
        rays_d = jnp.concatenate(
            [jnp.zeros((n, 2)), jnp.ones((n, 1))], axis=-1)
        d = jnp.full((n, 1), 1.0)
        rgb = jnp.full((n, 3), 0.5)

        rend = render_rays(params, spec, rc, key, rays_o, rays_d, d)
        l1, _ = total_loss(params, spec, rend, rgb, d, jnp.ones((n,)),
                           key, lw, with_smooth=False)

        # pad with garbage rays, mask them out
        pad = 8
        rays_o_p = jnp.concatenate([rays_o, jnp.ones((pad, 3)) * 9])
        rays_d_p = jnp.concatenate([rays_d, jnp.ones((pad, 3))])
        d_p = jnp.concatenate([d, jnp.full((pad, 1), 3.0)])
        rgb_p = jnp.concatenate([rgb, jnp.zeros((pad, 3))])
        mask_p = jnp.concatenate([jnp.ones((n,)), jnp.zeros((pad,))])
        rend_p = render_rays(params, spec, rc, key, rays_o_p, rays_d_p, d_p)
        l2, _ = total_loss(params, spec, rend_p, rgb_p, d_p, mask_p,
                           key, lw, with_smooth=False)
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)


class TestImportanceSampling:
    """sample_pdf + the n_importance render path (reference
    scene_rep.py:192-211; shipped configs all use n_importance=0)."""

    def test_sample_pdf_golden(self):
        """Hand-computed inverse-CDF case: bins [1,2,3], weights [1,3]
        -> pdf [.25,.75], cdf [0,.25,1]; det u = [0,.25,.5,.75,1]
        -> samples [1, 2, 2+1/3, 2+2/3, 3]."""
        from naruto_tpu.mapping.render import sample_pdf

        bins = jnp.array([[1.0, 2.0, 3.0]])
        w = jnp.array([[1.0, 3.0]])
        s = sample_pdf(jax.random.PRNGKey(0), bins, w, 5, det=True)
        np.testing.assert_allclose(
            np.asarray(s[0]),
            [1.0, 2.0, 2.0 + 1 / 3, 2.0 + 2 / 3, 3.0], atol=2e-4)

    def test_sample_pdf_concentrates_mass(self):
        """Random draws land in the heavy bin and inside the bin range."""
        from naruto_tpu.mapping.render import sample_pdf

        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
        w = jnp.zeros((4, 8)).at[:, 3].set(100.0)  # mass in [3/8, 4/8]
        s = sample_pdf(jax.random.PRNGKey(1), bins, w, 64, det=False)
        assert float(jnp.min(s)) >= 0.0 and float(jnp.max(s)) <= 1.0
        frac_in_bin = float(jnp.mean((s >= 3 / 8) & (s <= 4 / 8)))
        assert frac_in_bin > 0.95

    def test_render_importance_path(self):
        """n_importance>0 returns coarse `0`-suffixed maps, z_std, and a
        final pass with S + n_importance sorted samples."""
        from naruto_tpu.mapping.render import render_rays

        spec = tiny_spec()
        params = init_field_params(jax.random.PRNGKey(0), spec)
        rc = RenderConfig(n_range_d=5, n_samples_d=8, n_importance=4,
                          perturb=1.0)
        n = 8
        rays_o = jnp.zeros((n, 3))
        rays_d = jnp.concatenate(
            [jnp.zeros((n, 2)), jnp.ones((n, 1))], axis=-1)
        d = jnp.full((n, 1), 1.0)
        rend = render_rays(params, spec, rc, jax.random.PRNGKey(7),
                           rays_o, rays_d, d)
        s_all = rc.n_samples + rc.n_importance
        assert rend["z_vals"].shape == (n, s_all)
        assert rend["sdf"].shape == (n, s_all)
        assert rend["weights"].shape == (n, s_all)
        # final z_vals sorted and containing the coarse pass's range
        z = np.asarray(rend["z_vals"])
        assert (np.diff(z, axis=-1) >= 0).all()
        for k in ("rgb0", "depth0", "depth_var0", "acc0", "disp0"):
            assert k in rend
        assert rend["z_std"].shape == (n,)
        assert rend["rgb"].shape == (n, 3)
        assert "uncert_map" in rend  # composes with uncertainty (ref
        # importance branch would crash with uncert on; see render.py)

    def test_importance_losses_finite_and_grad(self):
        """The n_importance path must be differentiable end-to-end."""
        from naruto_tpu.mapping.render import render_rays

        spec = tiny_spec()
        params = init_field_params(jax.random.PRNGKey(0), spec)
        rc = RenderConfig(n_range_d=5, n_samples_d=8, n_importance=4)
        lw = LossWeights(smooth=0.0)
        n = 8
        rays_o = jnp.zeros((n, 3))
        rays_d = jnp.concatenate(
            [jnp.zeros((n, 2)), jnp.ones((n, 1))], axis=-1)
        d = jnp.full((n, 1), 1.0)
        rgb = jnp.full((n, 3), 0.5)

        def loss_fn(p):
            rend = render_rays(p, spec, rc, jax.random.PRNGKey(7),
                               rays_o, rays_d, d)
            l, _ = total_loss(p, spec, rend, rgb, d, jnp.ones((n,)),
                              jax.random.PRNGKey(8), lw, with_smooth=False)
            return l

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        gleaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in gleaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in gleaves)


class TestKeyframes:
    def test_add_and_sample(self):
        db = init_keyframe_db(4, 16)
        rays = jnp.concatenate([
            jnp.ones((100, 6)),
            jnp.linspace(0.1, 2.0, 100)[:, None]], axis=-1)
        db = add_keyframe(db, rays, 0, jax.random.PRNGKey(0))
        assert int(db.count) == 1
        assert int(db.frame_ids[0]) == 0
        s, ids = sample_global_rays(db, jax.random.PRNGKey(1), 32)
        assert s.shape == (32, 7)
        assert np.all(np.asarray(ids) == 0)

    def test_depth_filter(self):
        db = init_keyframe_db(2, 8)
        depth = jnp.concatenate([jnp.zeros(50), jnp.full((50,), 1.5)])
        rays = jnp.concatenate([jnp.ones((100, 6)), depth[:, None]], axis=-1)
        db = add_keyframe(db, rays, 0, jax.random.PRNGKey(0))
        stored = np.asarray(db.rays[:8])  # slot 0 occupies the first quota
        assert np.all(stored[:, 6] > 0)  # only valid-depth rays stored

    def test_duplication_when_few_valid(self):
        db = init_keyframe_db(2, 8)
        depth = jnp.concatenate([jnp.full((3,), 2.0), jnp.zeros(97)])
        rays = jnp.concatenate(
            [jnp.arange(100, dtype=jnp.float32)[:, None].repeat(6, 1),
             depth[:, None]], axis=-1)
        db = add_keyframe(db, rays, 0, jax.random.PRNGKey(0))
        stored = np.asarray(db.rays[:8])
        assert np.all(stored[:, 6] > 0)  # recycled valid rays, no invalid


def _render_wall_frame(cfg):
    """Synthetic RGB-D frame: camera at origin looking down +z (RDF),
    flat wall at z=1.5 with a horizontal color gradient."""
    from naruto_tpu.geometry.rays import get_camera_rays
    H, W = cfg.cam.H, cfg.cam.W
    dirs = get_camera_rays(H, W, cfg.cam.fx, cfg.cam.fy, cfg.cam.cx,
                           cfg.cam.cy)
    depth = 1.5 / dirs[..., 2]  # z-depth of the z=1.5 plane is constant 1.5
    depth = np.full((H, W), 1.5, dtype=np.float32)
    u = np.linspace(0, 1, W, dtype=np.float32)
    color = np.stack([np.tile(u, (H, 1)),
                      np.full((H, W), 0.3, np.float32),
                      np.full((H, W), 0.6, np.float32)], axis=-1)
    return color, depth


class TestMapperEndToEnd:
    @pytest.fixture(scope="class")
    def run(self):
        cfg = tiny_cfg()
        mapper = Mapper(cfg)
        color, depth = _render_wall_frame(cfg)
        c2w = np.eye(4, dtype=np.float32)
        vols_by_step = {}
        for i in range(11):
            mapper.update_step(i)
            out = mapper.online_recon_step(i, color, depth, c2w)
            if out is not None:
                vols_by_step[i] = out
        return cfg, mapper, vols_by_step

    def test_volume_cadence(self, run):
        _, _, vols = run
        assert set(vols.keys()) == {0, 5, 10}  # step 0 + every map_every

    def test_volume_shapes(self, run):
        cfg, mapper, vols = run
        u, s = vols[10]
        assert u.shape == s.shape == mapper.vol_shape
        assert np.all(u >= 0)

    def test_keyframes_accrue(self, run):
        _, mapper, _ = run
        assert int(mapper.state.kf.count) == 3  # frames 0, 5, 10

    def test_field_learns_wall(self, run):
        """After a few mapping rounds the SDF should be positive well in
        front of the wall and lower near it."""
        cfg, mapper, _ = run
        near_cam = mapper.predict_sdf(np.array([[0.0, 0.0, 0.3]]))
        at_wall = mapper.predict_sdf(np.array([[0.0, 0.0, 1.5]]))
        assert near_cam[0] > at_wall[0]

    def test_poses_recorded(self, run):
        _, mapper, _ = run
        np.testing.assert_allclose(np.asarray(mapper.state.poses[7]),
                                   np.eye(4), atol=1e-6)

    def test_ckpt_roundtrip(self, run, tmp_path):
        _, mapper, _ = run
        p = str(tmp_path / "ckpt.pkl")
        mapper.save_ckpt(p)
        before = mapper.predict_sdf(np.array([[0.1, 0.2, 0.5]]))
        mapper.load_ckpt(p)
        after = mapper.predict_sdf(np.array([[0.1, 0.2, 0.5]]))
        np.testing.assert_allclose(before, after)


class TestFrameTransfer:
    def test_u8_quantized_upload_matches_f32(self):
        """Host numpy color is quantized to uint8 for the host->device hop
        and dequantized on device; the stored rays match the f32 path to
        half a quantization step. Device-resident (jnp) color passes
        through exactly."""
        import jax.numpy as jnp

        cfg = tiny_cfg()
        mapper = Mapper(cfg)
        H, W = cfg.cam.H, cfg.cam.W
        rng = np.random.default_rng(0)
        color = rng.random((H, W, 3), dtype=np.float32)
        depth = rng.random((H, W), dtype=np.float32) + 0.5

        rays_np = np.asarray(mapper.frame_to_rays(color, depth))
        rays_dev = np.asarray(
            mapper.frame_to_rays(jnp.asarray(color), depth))
        # numpy path: quantized to 1/255 steps
        assert np.abs(rays_np[:, 3:6] - color.reshape(-1, 3)).max() \
            <= 0.5 / 255 + 1e-6
        # device path: exact
        np.testing.assert_array_equal(rays_dev[:, 3:6],
                                      color.reshape(-1, 3))
        # pre-quantized uint8 input is accepted directly
        u8 = (np.clip(color, 0, 1) * 255 + 0.5).astype(np.uint8)
        rays_u8 = np.asarray(mapper.frame_to_rays(u8, depth))
        np.testing.assert_allclose(rays_u8, rays_np, atol=1e-7)
        # depth column is never quantized
        np.testing.assert_array_equal(rays_np[:, 6], depth.reshape(-1))


class TestMapperVariants:
    def test_smooth_cadence_and_frac_carry_run(self):
        """smooth_every=2 (conditional regularizer rider) + the slim
        frac-carry sort payload drive the full online_recon_step and still
        learn the wall; smooth_every=1 default is untouched parity."""
        cfg = tiny_cfg()
        cfg = deep_update(cfg, {"training": {"smooth_every": 2},
                                "grid": {"sort_carry": "frac"},
                                "mapper": {"approx_topk": True}})
        assert cfg.training.smooth_every == 2
        mapper = Mapper(cfg)
        assert mapper.spec.hash_spec.sort_carry == "frac"
        color, depth = _render_wall_frame(cfg)
        c2w = np.eye(4, dtype=np.float32)
        for i in range(6):
            mapper.update_step(i)
            mapper.online_recon_step(i, color, depth, c2w)
        near_cam = mapper.predict_sdf(np.array([[0.0, 0.0, 0.3]]))
        at_wall = mapper.predict_sdf(np.array([[0.0, 0.0, 1.5]]))
        assert np.isfinite(near_cam[0]) and np.isfinite(at_wall[0])
        assert near_cam[0] > at_wall[0]

    def test_topk_via_sort_selects_same_set(self, monkeypatch):
        """NARUTO_TOPK_VIA_SORT replaces lax.top_k with one full argsort
        (glue A/B, mapper._ba_impl). Same selected SET and the same
        ascending-score order on distinct scores; plus the knob drives the
        full online step (compiles, learns) like the default graph."""
        import jax

        k = 8
        score = jax.random.permutation(
            jax.random.PRNGKey(0),
            np.linspace(0.0, 1.0, 64, dtype=np.float32))
        _, sel_topk = jax.lax.top_k(-score, k)
        sel_sort = np.asarray(np.argsort(np.asarray(score))[:k])
        np.testing.assert_array_equal(np.asarray(sel_topk), sel_sort)

        monkeypatch.setenv("NARUTO_TOPK_VIA_SORT", "1")
        cfg = tiny_cfg()
        mapper = Mapper(cfg)
        color, depth = _render_wall_frame(cfg)
        c2w = np.eye(4, dtype=np.float32)
        for i in range(6):
            mapper.update_step(i)
            mapper.online_recon_step(i, color, depth, c2w)
        near_cam = mapper.predict_sdf(np.array([[0.0, 0.0, 0.3]]))
        at_wall = mapper.predict_sdf(np.array([[0.0, 0.0, 1.5]]))
        assert near_cam[0] > at_wall[0]

    def test_scan_unroll_matches_default(self, monkeypatch):
        """NARUTO_SCAN_UNROLL=2 (BA-scan body replication, a carry-
        plumbing A/B knob) must be semantically identical to the rolled
        loop: the body keys off the scanned `it`, not unroll position."""
        color = depth = None

        def run(unroll):
            nonlocal color, depth
            if unroll:
                monkeypatch.setenv("NARUTO_SCAN_UNROLL", unroll)
            else:
                monkeypatch.delenv("NARUTO_SCAN_UNROLL", raising=False)
            cfg = tiny_cfg()
            mapper = Mapper(cfg)
            if color is None:
                color, depth = _render_wall_frame(cfg)
            c2w = np.eye(4, dtype=np.float32)
            for i in range(4):
                mapper.update_step(i)
                mapper.online_recon_step(i, color, depth, c2w)
            pts = np.array([[0.0, 0.0, 0.3], [0.0, 0.0, 1.5]])
            return np.asarray(mapper.predict_sdf(pts))

        np.testing.assert_allclose(run("2"), run(None), rtol=2e-5,
                                   atol=2e-6)


class TestFullStateResume:
    def test_resume_reproduces_run(self):
        """Mid-run full-state checkpoint -> identical continuation."""
        cfg = tiny_cfg()
        color, depth = _render_wall_frame(cfg)
        c2w = np.eye(4, dtype=np.float32)

        m1 = Mapper(cfg)
        for i in range(6):
            m1.update_step(i)
            m1.online_recon_step(i, color, depth, c2w)
        import tempfile, os
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "full.pkl")
            m1.save_full_state(p)
            key_saved = m1._key

            m2 = Mapper(cfg)
            m2.load_full_state(p)
            m2._key = key_saved
            for i in range(6, 11):
                for m in (m1, m2):
                    m.update_step(i)
                    m.online_recon_step(i, color, depth, c2w)
            a = m1.predict_sdf(np.array([[0.1, 0.2, 0.5]]))
            b = m2.predict_sdf(np.array([[0.1, 0.2, 0.5]]))
            np.testing.assert_allclose(a, b, atol=1e-6)


class TestKeyframeFlatLayout:
    def test_slot_boundaries(self):
        """Flat store: each slot occupies a contiguous quota block."""
        db = init_keyframe_db(3, 4)
        assert db.rays.shape == (12, 7)
        r0 = jnp.concatenate([jnp.full((10, 6), 1.0),
                              jnp.full((10, 1), 1.0)], -1)
        r1 = jnp.concatenate([jnp.full((10, 6), 2.0),
                              jnp.full((10, 1), 2.0)], -1)
        db = add_keyframe(db, r0, 0, jax.random.PRNGKey(0))
        db = add_keyframe(db, r1, 5, jax.random.PRNGKey(1))
        rays = np.asarray(db.rays)
        assert np.all(rays[:4, 0] == 1.0)
        assert np.all(rays[4:8, 0] == 2.0)
        assert np.all(rays[8:] == 0.0)  # empty slot untouched
        # sampling maps flat indices back to the right slot ids
        s, ids = sample_global_rays(db, jax.random.PRNGKey(2), 64)
        ids = np.asarray(ids)
        vals = np.asarray(s)[:, 0]
        assert set(np.unique(ids)) <= {0, 1}
        np.testing.assert_array_equal(vals, (ids + 1).astype(np.float32))


class TestCkptFormat:
    """Versioned npz checkpoint format (utils/ckpt_io.py; VERDICT r4 #10)."""

    def _mapper(self, **over):
        cfg = tiny_cfg(**over)
        m = Mapper(cfg)
        color, depth = _render_wall_frame(cfg)
        m.update_step(0)
        m.online_recon_step(0, color, depth, np.eye(4, dtype=np.float32))
        return cfg, m, (color, depth)

    def test_npz_not_pickle(self, tmp_path):
        _, m, _ = self._mapper()
        p = str(tmp_path / "c.pkl")
        m.save_ckpt(p)
        with open(p, "rb") as f:
            assert f.read(4) == b"PK\x03\x04"  # zip/npz magic, not pickle
        import json
        import numpy as _np
        with _np.load(p, allow_pickle=False) as z:  # loads w/o pickle
            meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        assert meta["format_version"] == 1
        assert meta["kind"] == "eval_ckpt"
        assert "grid_layout" in meta and "treedef" in meta

    def test_legacy_pickle_read_compat(self, tmp_path):
        """Pre-r5 pickle blobs still load (one-round compat window)."""
        import pickle
        _, m, _ = self._mapper()
        p = str(tmp_path / "legacy.pkl")
        blob = jax.tree_util.tree_map(np.asarray, {
            "params": m.state.params, "poses": m.state.poses, "step": 7})
        with open(p, "wb") as f:
            pickle.dump(blob, f)
        before = m.predict_sdf(np.array([[0.1, 0.2, 0.5]]))
        m.load_ckpt(p)
        assert m.step == 7
        np.testing.assert_allclose(
            before, m.predict_sdf(np.array([[0.1, 0.2, 0.5]])))

    def test_cross_layout_rejected(self, tmp_path):
        """A ckpt written under another grid layout fails with a clear
        error, in both load_ckpt and load_full_state."""
        cfg_a = tiny_cfg()
        cfg_b = deep_update(tiny_cfg(), {"grid": {"n_levels": 2}})
        ma, mb = Mapper(cfg_a), Mapper(cfg_b)
        pa = str(tmp_path / "a.pkl")
        ma.save_ckpt(pa)
        with pytest.raises(ValueError):
            mb.load_ckpt(pa)
        pf = str(tmp_path / "af.pkl")
        ma.save_full_state(pf)
        with pytest.raises(ValueError):
            mb.load_full_state(pf)

    def test_full_state_extra_roundtrip(self, tmp_path):
        """Planner mitigation state rides the header (ADVICE r4 #1)."""
        _, m, _ = self._mapper()
        p = str(tmp_path / "fs.pkl")
        extra = {"planner": {"goal_visits": {"4,2,1": 3, "0,7,2": 1},
                             "last_goal_gi": [4, 2, 1]}}
        m.save_full_state(p, extra=extra)
        m2 = Mapper(tiny_cfg())
        got = m2.load_full_state(p)
        assert got == extra

    def test_planner_state_export_restore(self):
        from naruto_tpu.planner import init_planner
        from naruto_tpu.utils.printer import InfoPrinter
        cfg = tiny_cfg()
        pl = init_planner(cfg, InfoPrinter())
        pl._goal_visits = {(4, 2, 1): 3, (0, 7, 2): 1}
        pl._last_goal_gi = (4, 2, 1)
        blob = pl.export_state()
        import json as _json
        _json.dumps(blob)  # must be JSON-able (rides the npz header)
        pl2 = init_planner(cfg, InfoPrinter())
        pl2.restore_state(blob)
        assert pl2._goal_visits == {(4, 2, 1): 3, (0, 7, 2): 1}
        assert pl2._last_goal_gi == (4, 2, 1)

    def test_export_pose_cli(self, tmp_path):
        _, m, _ = self._mapper()
        p = str(tmp_path / "c.pkl")
        m.save_ckpt(p)
        out = str(tmp_path / "poses.npy")
        from naruto_tpu.export_pose import main as export_main
        export_main(["--ckpt", p, "--out", out, "--num", "2"])
        poses = np.load(out)
        assert poses.shape == (2, 4, 4)

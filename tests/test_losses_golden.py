"""Golden-value tests: losses pinned to hand-computed constants.

These lock in the reference's observable loss formulas (SURVEY.md §4 calls
for golden tests against constants derived from the reference formulas):
  rgb:   mean over N x 3 of (w * (pred - target))^2, w = 1 valid / 0.05 not
  depth: mean over valid rays of (pred - target)^2
  fs:    mean over N x S of ((sdf - 1) * front)^2 * (1 - n_fs / n_both)
  sdf:   mean over N x S of ((z + sdf * trunc - d) * mask)^2 * (1 - n_sdf/n_both)
  uncert (NLL): mean((d_hat - d)^2 / (2 sigma)) + 0.5 mean(log sigma)
"""
import jax.numpy as jnp
import numpy as np
import pytest

from naruto_tpu.mapping.losses import (
    LossWeights, rgb_depth_losses, sdf_losses, uncert_loss,
)


class TestGoldenRGBDepth:
    def test_rgb_with_invalid_depth_weighting(self):
        lw = LossWeights()
        rend = {"rgb": jnp.array([[0.5, 0.5, 0.5], [0.2, 0.2, 0.2]]),
                "depth": jnp.array([1.0, 2.0])}
        target_rgb = jnp.array([[0.0, 0.5, 0.5], [0.0, 0.2, 0.2]])
        target_d = jnp.array([[2.0], [0.0]])   # ray 1 invalid depth
        mask = jnp.ones((2,))
        rgb_l, depth_l, valid = rgb_depth_losses(rend, target_rgb, target_d,
                                                 mask, lw)
        # ray0 valid (w=1): err (0.5)^2 in channel 0; ray1 invalid (w=0.05):
        # err (0.05*0.2)^2 in channel 0; mean over 2*3 elements
        expected_rgb = (0.25 + (0.05 * 0.2) ** 2) / 6.0
        assert float(rgb_l) == pytest.approx(expected_rgb, rel=1e-5)
        # depth loss only over ray0: (1-2)^2 = 1
        assert float(depth_l) == pytest.approx(1.0, rel=1e-6)
        assert np.asarray(valid).tolist() == [True, False]

    def test_depth_trunc_excludes_far(self):
        lw = LossWeights(depth_trunc=5.0)
        rend = {"rgb": jnp.zeros((2, 3)), "depth": jnp.array([1.0, 1.0])}
        target_d = jnp.array([[2.0], [10.0]])  # ray 1 beyond depth_trunc
        _, depth_l, valid = rgb_depth_losses(rend, jnp.zeros((2, 3)),
                                             target_d, jnp.ones((2,)), lw)
        assert np.asarray(valid).tolist() == [True, False]
        assert float(depth_l) == pytest.approx(1.0)


class TestGoldenSDF:
    def test_hand_computed_masks_and_weights(self):
        lw = LossWeights(trunc=0.1)
        # one ray, 4 samples; depth = 1.0; trunc = 0.1
        z = jnp.array([[0.5, 0.95, 1.05, 1.5]])
        d = jnp.array([[1.0]])
        sdf = jnp.array([[2.0, 0.5, -0.5, -2.0]])
        mask = jnp.ones((1,))
        fs, sd = sdf_losses(sdf, z, d, mask, lw)
        # front region: z < 0.9 -> sample 0 only (n_fs = 1)
        # trunc region: 0.9 <= z <= 1.1 -> samples 1,2 (n_sdf = 2)
        # fs_factor = 1 - 1/3; sdf_factor = 1 - 2/3
        # fs raw: ((2-1)^2)/4 = 0.25 -> fs = 0.25 * 2/3
        assert float(fs) == pytest.approx(0.25 * (2 / 3), rel=1e-5)
        # sdf raw: ((0.95+0.05-1)^2 + (1.05-0.05-1)^2)/4 = 0 -> sd = 0
        assert float(sd) == pytest.approx(0.0, abs=1e-10)

    def test_imperfect_sdf_value(self):
        lw = LossWeights(trunc=0.1)
        z = jnp.array([[1.0]])
        d = jnp.array([[1.0]])
        sdf = jnp.array([[0.5]])   # predicts surface 5cm behind
        fs, sd = sdf_losses(sdf, z, d, jnp.ones((1,)), lw)
        # only sample is in trunc region: n_sdf=1, n_fs=0 -> sdf_factor = 0!?
        # no: factor = 1 - 1/1 = 0 -> matches reference get_masks semantics
        assert float(sd) == pytest.approx(0.0, abs=1e-12)

    def test_factors_with_both_regions(self):
        lw = LossWeights(trunc=0.1)
        z = jnp.array([[0.5, 1.0]])
        d = jnp.array([[1.0]])
        sdf = jnp.array([[0.0, 0.5]])
        fs, sd = sdf_losses(sdf, z, d, jnp.ones((1,)), lw)
        # n_fs = 1, n_sdf = 1 -> both factors 1/2
        # fs raw: ((0-1)^2)/2 = 0.5 -> 0.25
        assert float(fs) == pytest.approx(0.25, rel=1e-5)
        # sdf raw: ((1.0 + 0.05 - 1.0)^2)/2 = 0.00125 -> x 0.5 = 0.000625
        assert float(sd) == pytest.approx(0.000625, rel=1e-5)


class TestGoldenUncert:
    def test_nll_formula(self):
        rend = {"uncert_map": jnp.array([0.5, 1.0]),
                "depth": jnp.array([1.0, 2.0])}
        target_d = jnp.array([[1.5], [2.0]])
        lw = LossWeights()
        valid = jnp.array([True, True])
        out = float(uncert_loss(rend, target_d, valid, lw))
        # mean((x-y)^2/(2 sigma)): (0.25/(2*0.5) + 0/(2*1))/2 = 0.125
        # 0.5*mean(log sigma): 0.5*(log 0.5 + log 1)/2 = 0.25*log 0.5
        expected = 0.125 + 0.25 * np.log(0.5)
        assert out == pytest.approx(expected, rel=1e-4)

    def test_invalid_rays_excluded(self):
        rend = {"uncert_map": jnp.array([0.5, 100.0]),
                "depth": jnp.array([1.0, 99.0])}
        target_d = jnp.array([[1.5], [0.0]])
        valid = jnp.array([True, False])
        out = float(uncert_loss(rend, target_d, valid, LossWeights()))
        expected = 0.25 / (2 * 0.5) + 0.5 * np.log(0.5)
        assert out == pytest.approx(expected, rel=1e-4)


def test_smooth_sample_estimates_full_tv(rng):
    """Monte-Carlo smoothness (smooth_sample>0) estimates the full-grid TV
    in expectation (checked on a smooth analytic embedding)."""
    import jax
    import jax.numpy as jnp
    from naruto_tpu.mapping.field import FieldSpec
    from naruto_tpu.mapping.losses import (LossWeights, smoothness_points,
                                           smoothness_tv)

    spec = FieldSpec(bound=((-1, 1), (-1, 1), (-1, 1)), n_levels=2,
                     log2_hashmap_size=10, base_resolution=4, voxel_sdf=0.1,
                     uncert_grid=False)

    def embed_fn(x01):
        # smooth deterministic "embedding": linear + quadratic features
        return jnp.concatenate([x01, x01 ** 2], axis=-1)

    lw_full = LossWeights(smooth_pts=8, smooth_vox=0.2, smooth_sample=0)
    lw_mc = LossWeights(smooth_pts=8, smooth_vox=0.2, smooth_sample=4096)

    key = jax.random.PRNGKey(0)
    x_full, n = smoothness_points(spec, key, lw_full)
    tv_full = smoothness_tv(embed_fn(x_full), n, lw_full)

    # average several MC draws with the same grid placement key
    tvs = []
    for i in range(8):
        k = jax.random.PRNGKey(0)  # same placement/jitter stream
        # vary only the pair-sampling sub-key by folding
        x_mc, n2 = smoothness_points(
            spec, jax.random.fold_in(k, i) if i else k, lw_mc)
        tvs.append(float(smoothness_tv(embed_fn(x_mc), n2, lw_mc)))
    # different jitters shift the absolute value; compare magnitudes only
    import numpy as np
    assert 0.3 < np.mean(tvs) / float(tv_full) < 3.0

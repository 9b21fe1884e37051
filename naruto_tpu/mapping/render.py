"""Depth-guided volumetric SDF rendering.

Parity contracts:
  * z sampling — scene_rep.py:160-180: 11 samples in +-range_d around the
    measured depth (rays with invalid depth fall back to near..far), plus 32
    uniform near..far samples; concatenated, sorted, stratified-perturbed.
  * sdf2weights — upstream Co-SLAM (SURVEY.md §2.9): bell weight
    sigmoid(s/tr)*sigmoid(-s/tr), masked to before the first sign change
    (z < z_first_crossing + tr), normalized with +1e-8.
  * raw2outputs — scene_rep.py:66-96: sigmoid rgb; depth/var/disp/acc maps;
    uncertainty rendering  uncert_map = sum_i w_i^2 (softplus(u_i)+0.01).

All shapes static: [N_rays, S] with S = n_range_d + n_samples_d.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from naruto_tpu.mapping.field import FieldSpec, field_query, normalize_world


class RenderConfig(NamedTuple):
    near: float = 0.0
    far: float = 5.0
    n_range_d: int = 11
    range_d: float = 0.1
    n_samples_d: int = 32
    perturb: float = 1.0
    trunc: float = 0.1
    sc_factor: float = 1.0

    @property
    def n_samples(self) -> int:
        return self.n_range_d + self.n_samples_d


def sample_z_vals(key, target_d: jnp.ndarray, rc: RenderConfig,
                  z_noise: jnp.ndarray | None = None) -> jnp.ndarray:
    """target_d: [N, 1] measured depths. Returns sorted z values [N, S].

    z_noise: optional precomputed U[0,1) [N, S] stratified-perturbation draw
    (used by the sharded BA path so the same per-ray randomness is drawn
    whether or not the batch is sharded)."""
    n = target_d.shape[0]
    z_depth = jnp.linspace(-rc.range_d, rc.range_d, rc.n_range_d)
    z_depth = z_depth[None, :] + target_d                     # [N, 11]
    z_fallback = jnp.broadcast_to(
        jnp.linspace(rc.near, rc.far, rc.n_range_d), (n, rc.n_range_d))
    z_depth = jnp.where(target_d <= 0, z_fallback, z_depth)

    if rc.n_samples_d > 0:
        nu, nd = rc.n_samples_d, rc.n_range_d
        z_uniform = jnp.broadcast_to(
            jnp.linspace(rc.near, rc.far, nu), (n, nu))
        # both lists are sorted — merge by rank arithmetic instead of
        # lax.sort (XLA's sort costs ~2 ms/iter even at this size):
        # u_rank[i] = i + #(d < u_i), d_rank[j] = j + #(u <= d_j) is a
        # valid permutation incl. ties, assembled via one-hot sums.
        s = nu + nd
        u_rank = (jnp.arange(nu)[None]
                  + jnp.sum(z_depth[:, None, :] < z_uniform[:, :, None],
                            axis=-1))
        d_rank = (jnp.arange(nd)[None]
                  + jnp.sum(z_uniform[:, None, :] <= z_depth[:, :, None],
                            axis=-1))
        z_vals = (
            jnp.sum(jax.nn.one_hot(u_rank, s, dtype=z_uniform.dtype)
                    * z_uniform[..., None], axis=1)
            + jnp.sum(jax.nn.one_hot(d_rank, s, dtype=z_depth.dtype)
                      * z_depth[..., None], axis=1))
    else:
        z_vals = z_depth

    if rc.perturb > 0:
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        t = (jax.random.uniform(key, z_vals.shape)
             if z_noise is None else z_noise)
        z_vals = lower + (upper - lower) * t
    return z_vals


def sdf2weights(sdf: jnp.ndarray, z_vals: jnp.ndarray,
                rc: RenderConfig) -> jnp.ndarray:
    """sdf, z_vals: [N, S] -> normalized weights [N, S]."""
    tr = rc.trunc
    w = jax.nn.sigmoid(sdf / tr) * jax.nn.sigmoid(-sdf / tr)
    # first zero crossing along the ray
    signs = sdf[:, 1:] * sdf[:, :-1]
    crossing = (signs < 0.0).astype(jnp.float32)              # [N, S-1]
    first = jnp.argmax(crossing, axis=-1)                     # 0 if none
    z_min = jnp.take_along_axis(z_vals, first[:, None], axis=-1)  # [N, 1]
    mask = (z_vals < z_min + rc.sc_factor * tr).astype(jnp.float32)
    w = w * mask
    return w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)


def render_rays(params, spec: FieldSpec, rc: RenderConfig, key,
                rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                target_d: jnp.ndarray,
                extra_pts01: jnp.ndarray | None = None,
                z_noise: jnp.ndarray | None = None
                ) -> Dict[str, jnp.ndarray]:
    """rays_o/d: [N,3] world; target_d: [N,1].

    Returns rendered maps + raw field outputs (for SDF losses), flattening
    [N, S] points into one [N*S] batch so the tiny MLPs see a single large
    MXU-friendly matmul. `extra_pts01` (normalized) piggybacks extra hash-
    embedding queries (the smoothness regularizer) on the same encode so
    the backward runs ONE segment-sum; returned as "extra_embed".
    """
    n = rays_o.shape[0]
    z_vals = sample_z_vals(key, target_d, rc, z_noise)        # [N, S]
    s = z_vals.shape[-1]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    x01 = normalize_world(pts.reshape(-1, 3), spec)
    extra_embed = None
    if extra_pts01 is not None:
        from naruto_tpu.mapping.field import field_query_plus_embed
        raw, extra_embed = field_query_plus_embed(params, x01,
                                                  extra_pts01, spec)
        raw = raw.reshape(n, s, 5)
    else:
        raw = field_query(params, x01, spec).reshape(n, s, 5)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sdf = raw[..., 3]
    weights = sdf2weights(sdf, z_vals, rc)                    # [N, S]
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)      # [N, 3]
    depth_map = jnp.sum(weights * z_vals, axis=-1)            # [N]
    depth_var = jnp.sum(
        weights * jnp.square(z_vals - depth_map[:, None]), axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / (acc_map + 1e-10))

    out = {
        "rgb": rgb_map, "depth": depth_map, "depth_var": depth_var,
        "acc": acc_map, "disp": disp_map, "z_vals": z_vals,
        "sdf": sdf, "weights": weights,
    }
    if spec.has_uncert:
        uncert = jax.nn.softplus(raw[..., 4]) + 0.01   # min uncertainty 0.01
        out["uncert_map"] = jnp.sum(weights * weights * uncert, axis=-1)
    if extra_embed is not None:
        out["extra_embed"] = extra_embed
    return out

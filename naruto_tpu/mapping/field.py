"""The neural scene field: hash-grid + one-blob encoded SDF/color/uncertainty.

Functional redesign of the reference's JointEncodingNaruto + decoders
(src/slam/coslam/model/scene_rep.py, src/slam/coslam/model/decoder.py):
instead of an nn.Module with mixins over unvendored upstream classes, the
field is a frozen `FieldSpec` (static hyperparameters, hashable -> jit
static arg) plus a params pytree transformed by pure functions.

Wiring (parity contract):
  * hash features h = HashGrid(x01)              [32]   (scene_rep.py:59)
  * uncertainty   u = trilerp(uncert_grid, x01)  [1]    (scene_rep.py:60-63,
      align_corners=False; learnable grid init 3.0, scene_rep.py:49-56)
  * position      p = OneBlob(x01)               [48]
  * sdf net: MLP([h, p]) -> [1 sdf + 15 geo]     (decoder.py:29-41; the
      uncertainty channel bypasses the MLP and is appended to its output)
  * color net: MLP([p, geo]) -> [3 rgb]          (decoder.py:80-116)
  * raw output channel order [rgb(3), sdf, uncert] (decoder.py:116)

SDF values are in truncation units: metric_sdf = sdf * trunc
(the sdf loss supervises z + sdf*trunc ~ depth — upstream get_sdf_loss).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from naruto_tpu.geometry.voxel import volume_shape
from naruto_tpu.ops.encoding import HashGridSpec, hash_encode, init_hash_table
from naruto_tpu.ops.grid_sample import trilinear_sample
from naruto_tpu.ops.mlp import init_mlp_params, mlp_apply
from naruto_tpu.ops.one_blob import one_blob_encode

Params = Dict[str, object]


@dataclass(frozen=True)
class FieldSpec:
    bound: Tuple[Tuple[float, float], ...]  # scene AABB (meters), static
    n_levels: int = 4
    n_features: int = 8
    log2_hashmap_size: int = 16
    base_resolution: int = 16
    table_dtype: str = "bfloat16"
    # "vertex" (exact tcnn) | "cell" (fast) | "hybrid" (fast + shared
    # vertices on dense levels) — see ops/encoding.HashGridSpec.layout
    table_layout: str = "vertex"
    # backward sort payload: "frac" | "weights" (HashGridSpec.sort_carry)
    sort_carry: str = "frac"
    voxel_sdf: float = 0.02
    pos_n_bins: int = 16
    geo_feat_dim: int = 15
    hidden_dim: int = 32
    num_layers: int = 2
    hidden_dim_color: int = 32
    num_layers_color: int = 2
    uncert_grid: bool = True
    pred_uncert: bool = False
    uncert_voxel_size: float = 0.1
    # whether query positions carry gradients (needed only when poses are
    # optimized — tracking / BA pose optimization). When False the custom-VJP
    # position-gradient paths (a 12M gather + einsum per iteration) are
    # dead-code-eliminated by XLA.
    diff_positions: bool = False

    @functools.cached_property
    def hash_spec(self) -> HashGridSpec:
        return HashGridSpec.from_bound(
            np.asarray(self.bound), voxel_sdf=self.voxel_sdf,
            n_levels=self.n_levels, n_features=self.n_features,
            log2_table_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            gather_dtype=self.table_dtype,
            layout=self.table_layout,
            sort_carry=self.sort_carry)

    @functools.cached_property
    def uncert_shape(self) -> Tuple[int, int, int]:
        return volume_shape(np.asarray(self.bound), self.uncert_voxel_size)

    @property
    def hash_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def pos_dim(self) -> int:
        return 3 * self.pos_n_bins

    @property
    def bound_np(self) -> np.ndarray:
        return np.asarray(self.bound, dtype=np.float32)

    @property
    def has_uncert(self) -> bool:
        return self.uncert_grid or self.pred_uncert

    def sdf_mlp_dims(self):
        extra = 1 if self.pred_uncert else 0
        out = 1 + self.geo_feat_dim + extra
        return ([self.hash_dim + self.pos_dim]
                + [self.hidden_dim] * (self.num_layers - 1) + [out])

    def color_mlp_dims(self):
        return ([self.pos_dim + self.geo_feat_dim]
                + [self.hidden_dim_color] * (self.num_layers_color - 1) + [3])


def init_field_params(key, spec: FieldSpec) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params: Params = {
        "table": init_hash_table(k1, spec.hash_spec),
        "sdf_mlp": init_mlp_params(k2, spec.sdf_mlp_dims()),
        "color_mlp": init_mlp_params(k3, spec.color_mlp_dims()),
    }
    if spec.uncert_grid:
        # init 3.0 — ref: scene_rep.py:54
        params["uncert_grid"] = jnp.full(spec.uncert_shape, 3.0,
                                         dtype=jnp.float32)
    return params


def normalize_world(pts: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """World (meters) -> [0,1]^3 field domain (upstream run_network contract)."""
    bound = jnp.asarray(spec.bound_np)
    return (pts - bound[:, 0]) / (bound[:, 1] - bound[:, 0])


def query_uncert(params: Params, x01: jnp.ndarray,
                 spec: FieldSpec) -> jnp.ndarray:
    """Trilinearly sample the learnable uncertainty grid (raw, pre-softplus).
    align_corners=False — ref: scene_rep.py:62."""
    return trilinear_sample(params["uncert_grid"], x01, align_corners=False)


def query_geo(params: Params, x01: jnp.ndarray, spec: FieldSpec):
    """(sdf, geo_feat, raw_uncert) at normalized points x01 [N, 3]."""
    if not spec.diff_positions:
        x01 = jax.lax.stop_gradient(x01)
    h = hash_encode(params["table"], x01, spec.hash_spec)
    p = one_blob_encode(x01, spec.pos_n_bins)
    out = mlp_apply(params["sdf_mlp"], jnp.concatenate([h, p], axis=-1))
    sdf = out[:, 0]
    if spec.pred_uncert:
        geo, uncert = out[:, 1:-1], out[:, -1]
    else:
        geo = out[:, 1:]
        uncert = (query_uncert(params, x01, spec) if spec.uncert_grid
                  else jnp.zeros_like(sdf))
    return sdf, geo, uncert, p


def field_query(params: Params, x01: jnp.ndarray,
                spec: FieldSpec) -> jnp.ndarray:
    """Full raw query -> [N, 5]: [rgb(3), sdf, uncert]. rgb is pre-sigmoid."""
    sdf, geo, uncert, p = query_geo(params, x01, spec)
    rgb = mlp_apply(params["color_mlp"], jnp.concatenate([p, geo], axis=-1))
    return jnp.concatenate(
        [rgb, sdf[:, None], uncert[:, None]], axis=-1)


def field_query_plus_embed(params: Params, x01: jnp.ndarray,
                           x01_extra: jnp.ndarray, spec: FieldSpec):
    """Full raw query on x01 plus hash embeddings at x01_extra, sharing ONE
    hash encode (and hence one backward segment-sum) for both point sets —
    the smoothness regularizer rides along with the render batch."""
    if not spec.diff_positions:
        x01 = jax.lax.stop_gradient(x01)
        x01_extra = jax.lax.stop_gradient(x01_extra)
    n = x01.shape[0]
    both = jnp.concatenate([x01, x01_extra], axis=0)
    h_all = hash_encode(params["table"], both, spec.hash_spec)
    h, h_extra = h_all[:n], h_all[n:]

    p = one_blob_encode(x01, spec.pos_n_bins)
    out = mlp_apply(params["sdf_mlp"], jnp.concatenate([h, p], axis=-1))
    sdf = out[:, 0]
    if spec.pred_uncert:
        geo, uncert = out[:, 1:-1], out[:, -1]
    else:
        geo = out[:, 1:]
        uncert = (query_uncert(params, x01, spec) if spec.uncert_grid
                  else jnp.zeros_like(sdf))
    rgb = mlp_apply(params["color_mlp"], jnp.concatenate([p, geo], axis=-1))
    raw = jnp.concatenate([rgb, sdf[:, None], uncert[:, None]], axis=-1)
    return raw, h_extra


def query_sdf(params: Params, x01: jnp.ndarray, spec: FieldSpec,
              with_uncert: bool = False):
    """SDF (and optionally raw uncertainty) — the universal field-query API
    used by volumes / mesh / MAD eval (ref: scene_rep.py:98-130)."""
    sdf, _, uncert, _ = query_geo(params, x01, spec)
    if with_uncert:
        return sdf, uncert
    return sdf


def query_embed(params: Params, x01: jnp.ndarray,
                spec: FieldSpec) -> jnp.ndarray:
    """Hash embedding only (used by the smoothness regularizer and the
    observed-region test of coslam_utils.py:84-86)."""
    return hash_encode(params["table"], x01, spec.hash_spec)

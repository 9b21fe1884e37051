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
    table_layout: str = "vertex"    # "vertex" (exact tcnn) | "cell" (fast)
    # MLP matmul compute dtype; fp32 master params live in the optimizer.
    # None/"float32" = exact reference math, "bfloat16" = fast path.
    mlp_dtype: str = "float32"
    # route field evaluation through the fused Pallas kernels when the
    # architecture matches (see fused_supported)
    fused: bool = False
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
            layout=self.table_layout)

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


def _mlp_dt(spec: FieldSpec):
    import jax.numpy as _jnp

    return None if spec.mlp_dtype in (None, "float32") else _jnp.bfloat16


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
    out = mlp_apply(params["sdf_mlp"], jnp.concatenate([h, p], axis=-1),
                    compute_dtype=_mlp_dt(spec))
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
    rgb = mlp_apply(params["color_mlp"], jnp.concatenate([p, geo], axis=-1),
                    compute_dtype=_mlp_dt(spec))
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
    out = mlp_apply(params["sdf_mlp"], jnp.concatenate([h, p], axis=-1),
                    compute_dtype=_mlp_dt(spec))
    sdf = out[:, 0]
    if spec.pred_uncert:
        geo, uncert = out[:, 1:-1], out[:, -1]
    else:
        geo = out[:, 1:]
        uncert = (query_uncert(params, x01, spec) if spec.uncert_grid
                  else jnp.zeros_like(sdf))
    rgb = mlp_apply(params["color_mlp"], jnp.concatenate([p, geo], axis=-1),
                    compute_dtype=_mlp_dt(spec))
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


# ================================================================ fused path
def fused_supported(spec: FieldSpec) -> bool:
    """The Pallas fused field kernel covers the reference architecture
    (2x32 MLPs, 15 geo features, 32-dim hash output, one-blob 16) with
    fixed poses; anything else falls back to the composable XLA path."""
    import os

    if os.environ.get("NARUTO_NO_PALLAS"):
        return False
    return (not spec.diff_positions and not spec.pred_uncert
            and spec.uncert_grid
            and spec.num_layers == 2 and spec.num_layers_color == 2
            and spec.hidden_dim == 32 and spec.hidden_dim_color == 32
            and spec.geo_feat_dim == 15 and spec.pos_n_bins == 16
            and spec.hash_dim == 32)


@functools.lru_cache(maxsize=8)
def _expand_index(n_levels: int, n_features: int) -> np.ndarray:
    """Row-expansion index: W1x[(l*8+c)*F+f] = W1h[l*F+f]."""
    L, F = n_levels, n_features
    idx = np.zeros((L * 8 * F,), np.int32)
    for l in range(L):
        for c in range(8):
            for f in range(F):
                idx[(l * 8 + c) * F + f] = l * F + f
    return idx


def _fused_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused_gather(table, x01, spec: FieldSpec):
    from naruto_tpu.ops.encoding import (_cell_indices, _corner_indices)

    hs = spec.hash_spec
    n = x01.shape[0]
    gtable = table.astype(jnp.bfloat16)
    if hs.layout == "cell":
        idx, w = _cell_indices(x01, hs)
        rows = jnp.take(gtable, idx.reshape(-1), axis=0)
    else:
        idx, w = _corner_indices(x01, hs)
        rows = jnp.take(gtable, idx, axis=0)
    rf = spec.n_levels * 8 * spec.n_features
    rows = rows.reshape(n, rf)
    w_rep = jnp.repeat(w.reshape(n, spec.n_levels * 8).astype(jnp.bfloat16),
                       spec.n_features, axis=1)
    return idx, w, rows, w_rep


def _fused_pack_weights(spec, w1, w2, wc1, wc2):
    exp = jnp.asarray(_expand_index(spec.n_levels, spec.n_features))
    lf = spec.hash_dim
    w1h = w1[:lf].astype(jnp.bfloat16)                 # [LF, 32]
    w1p = w1[lf:].astype(jnp.bfloat16)                 # [POS, 32]
    w1x = jnp.take(w1h, exp, axis=0)                   # [RF, 32]
    w2b = w2.astype(jnp.bfloat16)                      # [32, 16]
    wc1b = jnp.concatenate(
        [wc1, jnp.zeros((1, wc1.shape[1]), wc1.dtype)],
        axis=0).astype(jnp.bfloat16)                   # [64, 32]
    wc2b = jnp.concatenate(
        [wc2, jnp.zeros((wc2.shape[0], 5), wc2.dtype)],
        axis=1).astype(jnp.bfloat16)                   # [32, 8]
    return w1h, w1p, w1x, w2b, wc1b, wc2b


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_field_query(spec: FieldSpec, table, w1, w2, wc1, wc2, x01,
                      uncert_raw):
    """raw [N, 5] = [rgb(3) pre-sigmoid, sdf, uncert] via the Pallas fused
    field kernels (ops/pallas_kernels.py). Gradients flow to the table
    (sorted segment sum), all MLP weights, and the uncertainty channel."""
    out, _ = _fused_fwd_impl(spec, table, w1, w2, wc1, wc2, x01, uncert_raw)
    return out


def _fused_fwd_impl(spec, table, w1, w2, wc1, wc2, x01, uncert_raw):
    from naruto_tpu.ops.pallas_kernels import field_fused_fwd

    idx, w, rows, w_rep = _fused_gather(table, x01, spec)
    _, w1p, w1x, w2b, wc1b, wc2b = _fused_pack_weights(spec, w1, w2, wc1,
                                                       wc2)
    p16 = one_blob_encode(x01, spec.pos_n_bins).astype(jnp.bfloat16)
    raw = field_fused_fwd(rows, w_rep, p16, uncert_raw[:, None],
                          w1x, w1p, w2b, wc1b, wc2b,
                          n_bins=spec.pos_n_bins,
                          interpret=_fused_interpret())
    return raw, (table, w1, w2, wc1, wc2, x01, idx, w, rows, w_rep)


def _fused_fwd(spec, table, w1, w2, wc1, wc2, x01, uncert_raw):
    return _fused_fwd_impl(spec, table, w1, w2, wc1, wc2, x01, uncert_raw)


def _fused_bwd(spec, res, g):
    from naruto_tpu.ops.encoding import encode_grads_from_gembed
    from naruto_tpu.ops.pallas_kernels import field_fused_bwd

    table, w1, w2, wc1, wc2, x01, idx, w, rows, w_rep = res
    lf = spec.hash_dim
    w1h, w1p, w1x, w2b, wc1b, wc2b = _fused_pack_weights(spec, w1, w2, wc1,
                                                         wc2)
    stacked = jnp.concatenate([w1p, w1h], axis=0)      # [POS+LF, 32]
    from naruto_tpu.ops.encoding import _blend_matrix
    ws = jnp.asarray(_blend_matrix(spec.n_levels, spec.n_features),
                     dtype=jnp.bfloat16)
    p16 = one_blob_encode(x01, spec.pos_n_bins).astype(jnp.bfloat16)
    d_embed, dw1h, dw1p, dw2, dwc1, dwc2 = field_fused_bwd(
        rows, w_rep, p16, g, w1x, stacked, w2b, wc1b, wc2b, ws,
        n_bins=spec.pos_n_bins, interpret=_fused_interpret())

    d_table, _ = encode_grads_from_gembed(
        spec.hash_spec, table, x01, idx, w, d_embed)
    d_w1 = jnp.concatenate([dw1h, dw1p], axis=0).astype(w1.dtype)
    d_wc1 = dwc1[:wc1.shape[0]].astype(wc1.dtype)
    d_wc2 = dwc2[:, :wc2.shape[1]].astype(wc2.dtype)
    d_uncert = g[:, 4]
    d_x01 = jnp.zeros_like(x01)
    return (d_table, d_w1, dw2.astype(w2.dtype), d_wc1, d_wc2, d_x01,
            d_uncert)


fused_field_query.defvjp(_fused_fwd, _fused_bwd)


def field_query_fused(params: Params, x01: jnp.ndarray,
                      spec: FieldSpec) -> jnp.ndarray:
    """Drop-in for field_query through the fused Pallas kernels."""
    x01 = jax.lax.stop_gradient(x01)
    uncert = query_uncert(params, x01, spec)
    return fused_field_query(
        spec, params["table"], params["sdf_mlp"][0], params["sdf_mlp"][1],
        params["color_mlp"][0], params["color_mlp"][1], x01, uncert)

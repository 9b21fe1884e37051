"""Keyframe ray database — fixed-capacity device-resident buffer.

The reference preallocates a [num_kf, rays_per_kf, 7] tensor and fills one
slot per keyframe (upstream KeyFrameDatabase + keyframe.py:38-60): each
stored ray is [direction(3), rgb(3), depth(1)], sampled from the frame with
depth filtering (0 < d <= depth_trunc) and duplicated to fill the quota when
too few pixels are valid. Global sampling draws uniformly over all stored
keyframe rays and returns (rays, kf_ids).

TPU redesign: everything static-shape on device.
  * add: one argsort-free random selection via random scores — each pixel
    gets u ~ U[0,1) plus a +2 penalty if depth-invalid; the rays_per_kf
    smallest scores are the chosen pixels (random valid pixels first, invalid
    only if the frame has fewer valid pixels than the quota, in which case
    valid picks are recycled — mirroring the duplication rule).
  * sample: uniform integers in [0, kf_count * rays_per_kf) with a traced
    upper bound, so no recompilation as keyframes accrue.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class KeyframeDB(NamedTuple):
    rays: jnp.ndarray       # [num_kf, rays_per_kf, 7]
    frame_ids: jnp.ndarray  # [num_kf] int32, -1 for empty slots
    count: jnp.ndarray      # [] int32 — number of filled slots


def init_keyframe_db(num_kf: int, rays_per_kf: int) -> KeyframeDB:
    return KeyframeDB(
        rays=jnp.zeros((num_kf, rays_per_kf, 7), dtype=jnp.float32),
        frame_ids=jnp.full((num_kf,), -1, dtype=jnp.int32),
        count=jnp.zeros((), dtype=jnp.int32),
    )


def add_keyframe(db: KeyframeDB, frame_rays: jnp.ndarray, frame_id,
                 key, depth_trunc: float = 100.0,
                 filter_depth: bool = True) -> KeyframeDB:
    """frame_rays: [H*W, 7]. Fills slot db.count."""
    n_pix = frame_rays.shape[0]
    quota = db.rays.shape[1]
    depth = frame_rays[:, 6]
    if filter_depth:
        valid = (depth > 0.0) & (depth <= depth_trunc)
    else:
        valid = jnp.ones((n_pix,), dtype=bool)

    score = jax.random.uniform(key, (n_pix,)) + jnp.where(valid, 0.0, 2.0)
    _, idx = jax.lax.top_k(-score, quota)          # quota smallest scores
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # recycle valid picks if the frame has fewer valid pixels than the quota
    pos = jnp.arange(quota, dtype=jnp.int32)
    safe_n = jnp.maximum(n_valid, 1)
    pos = jnp.where(pos < n_valid, pos, pos % safe_n)
    chosen = idx[pos]
    slot_rays = frame_rays[chosen]                 # [quota, 7]

    slot = db.count
    return KeyframeDB(
        rays=jax.lax.dynamic_update_index_in_dim(db.rays, slot_rays, slot, 0),
        frame_ids=db.frame_ids.at[slot].set(
            jnp.asarray(frame_id, dtype=jnp.int32)),
        count=db.count + 1,
    )


def sample_global_rays(db: KeyframeDB, key,
                       n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform over all stored rays of filled slots.
    Returns (rays [n, 7], kf_slot_ids [n])."""
    rays_per_kf = db.rays.shape[1]
    total = jnp.maximum(db.count * rays_per_kf, 1)
    idx = jax.random.randint(key, (n,), 0, total)
    flat = db.rays.reshape(-1, 7)
    return flat[idx], (idx // rays_per_kf).astype(jnp.int32)

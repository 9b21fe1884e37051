"""Trilinear sampling of 3D voxel grids (torch.grid_sample equivalents).

Two conventions appear in the reference and both are provided:
  * align_corners=False — the learnable uncertainty grid is sampled this way
    (src/slam/coslam/model/scene_rep.py:62). Normalized coord g in [-1,1]
    maps to voxel coordinate ((g+1)*size - 1)/2.
  * align_corners=True — the planner's unused GPU SDF query
    (src/planner/rrt_naruto.py:275). g maps to (g+1)/2*(size-1).

Out-of-range coordinates are clamped to the border (torch default is zero
padding; inputs here are normalized points inside the AABB, so only the
half-voxel fringe differs — the learned grid adapts to whichever operator
trains it, so border clamping is the behavior-preserving choice that also
avoids wasted masking work on TPU).

Also provides `trilinear_interp_volume`, the unnormalized voxel-coordinate
interpolation used by the planner's collision checks
(src/planner/rrt.py:12-74), vectorized (the reference loops per point in
Python).
"""
from __future__ import annotations

import jax.numpy as jnp


def _gather_trilinear(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """vol: [X, Y, Z]; coords: [N, 3] in (possibly fractional) voxel units.
    Border-clamped trilinear interpolation. Returns [N]."""
    shape = jnp.asarray(vol.shape, dtype=jnp.float32)
    c = jnp.clip(coords, 0.0, shape - 1.0)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0,
                  jnp.asarray(vol.shape, dtype=jnp.int32) - 2)
    frac = c - i0.astype(jnp.float32)
    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]

    def at(dx, dy, dz):
        return vol[x0 + dx, y0 + dy, z0 + dz]

    c00 = at(0, 0, 0) * (1 - fz) + at(0, 0, 1) * fz
    c01 = at(0, 1, 0) * (1 - fz) + at(0, 1, 1) * fz
    c10 = at(1, 0, 0) * (1 - fz) + at(1, 0, 1) * fz
    c11 = at(1, 1, 0) * (1 - fz) + at(1, 1, 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def trilinear_sample(vol: jnp.ndarray, pts01: jnp.ndarray,
                     align_corners: bool = False) -> jnp.ndarray:
    """Sample vol [X,Y,Z] at normalized points pts01 [N,3] in [0,1]^3."""
    shape = jnp.asarray(vol.shape, dtype=jnp.float32)
    g = pts01 * 2.0 - 1.0
    if align_corners:
        coords = (g + 1.0) / 2.0 * (shape - 1.0)
    else:
        coords = ((g + 1.0) * shape - 1.0) / 2.0
    return _gather_trilinear(vol, coords)


def trilinear_interp_volume(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Interpolate at raw voxel coordinates [N,3] (planner convention)."""
    return _gather_trilinear(vol, coords)

"""Pinhole projection trio (jax): backprojection, projection, 3D transform.

Parity with the reference layer modules (SURVEY.md C27): Backprojection
(src/layers/backprojection.py:31-82), Projection (projection.py:30-64),
Transformation3D (transformation3d.py:30-48) — as pure functions instead of
nn.Modules.
"""
from __future__ import annotations

import jax.numpy as jnp


def backproject(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """depth [H, W] -> homogeneous camera points [4, H*W]:
    p = depth * K^-1 [u, v, 1]^T, with a 1s row appended."""
    H, W = depth.shape
    u, v = jnp.meshgrid(jnp.arange(W, dtype=depth.dtype),
                        jnp.arange(H, dtype=depth.dtype), indexing="xy")
    pix = jnp.stack([u.reshape(-1), v.reshape(-1),
                     jnp.ones(H * W, dtype=depth.dtype)])        # [3, HW]
    cam = (inv_K[:3, :3] @ pix) * depth.reshape(1, -1)
    return jnp.concatenate([cam, jnp.ones((1, H * W), dtype=depth.dtype)])


def project(points: jnp.ndarray, K: jnp.ndarray,
            eps: float = 1e-7) -> jnp.ndarray:
    """Homogeneous points [4, N] -> pixel coords [N, 2]."""
    cam = K[:3, :3] @ points[:3]
    uv = cam[:2] / jnp.maximum(cam[2:3], eps)
    return uv.T


def transform3d(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """[4,4] @ [4,N] homogeneous transform."""
    return T @ points

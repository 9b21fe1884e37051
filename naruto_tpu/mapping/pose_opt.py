"""Differentiable pose representation + camera tracking.

Behavioral contract from upstream Co-SLAM (SURVEY.md §2.9: the reference
inherits get_pose_representation / get_pose_param_optim / matrix_from_tensor
/ tracking_render; `rot_rep: 'axis_angle'` in every shipped config, and
tracking is disabled by default — poses then come from the planner/GT):

  * a pose is optimized as (axis-angle rot [3], translation [3]);
  * matrix_from_tensor = Rodrigues' formula (differentiable);
  * tracking_render: initialize from a constant-speed motion model, run
    `tracking.iter` Adam steps on `tracking.sample` rays drawn away from the
    image border (ignore_edge_W/H), minimizing the standard mapping losses
    with the field frozen; keep the iterate with the lowest loss
    (`tracking.best`).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


def axis_angle_to_matrix(rot: jnp.ndarray) -> jnp.ndarray:
    """rot: [..., 3] axis-angle -> [..., 3, 3] via Rodrigues.

    Uses the unnormalized form R = I + s1 [r]x + s2 [r]x^2 with
    s1 = sin(a)/a, s2 = (1-cos a)/a^2 and Taylor branches near a = 0 (the
    double-where pattern) so gradients are finite at the identity."""
    a2 = jnp.sum(rot * rot, axis=-1, keepdims=True)
    small = a2 < 1e-12
    a2_safe = jnp.where(small, 1.0, a2)
    a = jnp.sqrt(a2_safe)
    s1 = jnp.where(small, 1.0 - a2 / 6.0, jnp.sin(a) / a)
    s2 = jnp.where(small, 0.5 - a2 / 24.0, (1.0 - jnp.cos(a)) / a2_safe)

    x, y, z = rot[..., 0], rot[..., 1], rot[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rot.dtype), K.shape)
    return eye + s1[..., None] * K + s2[..., None] * (K @ K)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] axis-angle (log map)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    angle = jnp.arccos(cos)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    sin = jnp.sin(angle)[..., None]
    axis = w / jnp.maximum(2.0 * sin, 1e-8)
    small = (angle < 1e-6)[..., None]
    return jnp.where(small, w / 2.0, axis * angle[..., None])


def matrix_from_tensor(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(axis-angle [N,3], translation [N,3]) -> [N,4,4] c2w."""
    R = axis_angle_to_matrix(rot)
    n = rot.shape[0]
    T = jnp.tile(jnp.eye(4, dtype=rot.dtype), (n, 1, 1))
    T = T.at[:, :3, :3].set(R)
    T = T.at[:, :3, 3].set(trans)
    return T


def pose_to_tensor(c2w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return matrix_to_axis_angle(c2w[..., :3, :3]), c2w[..., :3, 3]


class TrackingConfig(NamedTuple):
    iters: int = 10
    sample: int = 1024
    lr_rot: float = 1e-3
    lr_trans: float = 1e-3
    ignore_edge_w: int = 20
    ignore_edge_h: int = 20
    best: bool = True
    const_speed: bool = True


def const_speed_init(prev: jnp.ndarray, prev2: jnp.ndarray) -> jnp.ndarray:
    """Constant-speed motion model: T_i ~= T_{i-1} (T_{i-2}^-1 T_{i-1})."""
    return prev @ jnp.linalg.inv(prev2) @ prev

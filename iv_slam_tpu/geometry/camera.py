"""Pinhole/stereo camera projection math (batched, jit-friendly).

Replaces the projection code scattered through the reference's Frame
(Frame.cc:557-613 isInFrustum, 958-977 UnprojectStereo), optimizer edges
(g2o types_six_dof_expmap) and matchers. Stereo observations follow the
reference convention: ``(u_left, v_left, u_right)`` with
``u_right = u_left - bf / z``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray  # baseline * fx

    @staticmethod
    def from_config(cam) -> "Intrinsics":
        f32 = jnp.float32
        return Intrinsics(
            f32(cam.fx), f32(cam.fy), f32(cam.cx), f32(cam.cy), f32(cam.bf)
        )


def project(K: Intrinsics, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) camera-frame points -> (..., 2) pixels."""
    z = pts_cam[..., 2]
    invz = 1.0 / z
    u = K.fx * pts_cam[..., 0] * invz + K.cx
    v = K.fy * pts_cam[..., 1] * invz + K.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(K: Intrinsics, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) camera-frame points -> (..., 3) [u_l, v_l, u_r]."""
    uv = project(K, pts_cam)
    ur = uv[..., 0] - K.bf / pts_cam[..., 2]
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def backproject(K: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3)."""
    x = (uv[..., 0] - K.cx) * depth / K.fx
    y = (uv[..., 1] - K.cy) * depth / K.fy
    return jnp.stack([x, y, depth], axis=-1)


def disparity_to_depth(K: Intrinsics, disparity: jnp.ndarray) -> jnp.ndarray:
    return K.bf / jnp.maximum(disparity, 1e-6)


def proj_jacobian_mono(K: Intrinsics, pc: jnp.ndarray) -> jnp.ndarray:
    """d(u,v)/d(pc): (..., 3) camera points -> (..., 2, 3)."""
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    invz = 1.0 / z
    invz2 = invz * invz
    zeros = jnp.zeros_like(x)
    row_u = jnp.stack([K.fx * invz, zeros, -K.fx * x * invz2], axis=-1)
    row_v = jnp.stack([zeros, K.fy * invz, -K.fy * y * invz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def proj_jacobian_stereo(K: Intrinsics, pc: jnp.ndarray) -> jnp.ndarray:
    """d(u_l,v_l,u_r)/d(pc): (..., 3) -> (..., 3, 3)."""
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    invz = 1.0 / z
    invz2 = invz * invz
    zeros = jnp.zeros_like(x)
    row_u = jnp.stack([K.fx * invz, zeros, -K.fx * x * invz2], axis=-1)
    row_v = jnp.stack([zeros, K.fy * invz, -K.fy * y * invz2], axis=-1)
    row_r = jnp.stack(
        [K.fx * invz, zeros, -K.fx * x * invz2 + K.bf * invz2], axis=-1
    )
    return jnp.stack([row_u, row_v, row_r], axis=-2)


def undistort_points(
    pts: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    dist: jnp.ndarray,
    iterations: int = 5,
) -> jnp.ndarray:
    """Iterative undistortion of (..., 2) pixel points (cv::undistortPoints
    semantics with k1,k2,p1,p2,k3; Frame.cc:696-737 UndistortKeyPoints)."""
    k1, k2, p1, p2, k3 = (dist[i] for i in range(5))
    x0 = (pts[..., 0] - cx) / fx
    y0 = (pts[..., 1] - cy) / fy
    x, y = x0, y0
    for _ in range(iterations):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)

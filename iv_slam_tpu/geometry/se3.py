"""Batched SO(3)/SE(3) operations in JAX.

TPU-native replacement for the SE3Quat/expmap machinery the reference gets
from g2o (Thirdparty/g2o/g2o/types/se3quat.h, types_six_dof_expmap.cpp).
All functions are jit/vmap-friendly: poses are (..., 4, 4) homogeneous
matrices or (..., 6) tangent vectors with the g2o convention
``xi = (omega, upsilon)`` — rotation first, translation second — so solver
Jacobian layouts line up with the reference's edge Jacobians.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-24  # only guards exact-zero division; Taylor handles small angles


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: (..., 3) -> (..., 3, 3). Stable near zero."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle Taylor fallbacks.
    use_taylor = theta2 < 1e-4
    A = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    return eye + A * W + B * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) axis-angle. Accurate for angles < pi.

    Differentiation-safe at the identity: theta comes from
    arctan2(|vee|/2, cos) rather than arccos, whose derivative is infinite
    at cos=1 — with arccos, jacfwd/jacrev of any residual sitting exactly
    at zero (e.g. an essential-graph edge whose measurement equals the
    current relative pose) is NaN and poisons the whole normal system."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin2 = 0.25 * jnp.sum(vee * vee, axis=-1)
    sin_t = jnp.sqrt(sin2 + _EPS)  # grad wrt vee is 0 at the identity
    theta = jnp.arctan2(sin_t, cos_t)
    small = sin2 < 1e-12
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.where(small, 1.0, sin_t)),
    )
    return vee * scale[..., None]


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map: (..., 6) tangent (omega, upsilon) -> (..., 4, 4)."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    use_taylor = theta2 < 1e-4
    A = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(use_taylor, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    R = eye + A * W + B * W2
    V = eye + B * W + C * W2
    t = (V @ v[..., None])[..., 0]
    return rt_to_mat(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log map: (..., 4, 4) -> (..., 6) tangent (omega, upsilon)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    use_taylor = theta2 < 1e-4
    A = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    D = jnp.where(
        use_taylor,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B)) / theta2,
    )
    Vinv = eye - 0.5 * W + D * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) from (..., 3, 3) and (..., 3)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., 4, 4) rigid transforms."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (4, 4) (or batched) transform to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) [x, y, z, w] -> rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) [x, y, z, w].

    Branch-free Shepperd's method (all four candidates computed, the best —
    largest pivot — selected with where), so it vmaps/jits cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    pivots = jnp.stack(
        [
            1.0 + tr,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    S = 2.0 * jnp.sqrt(jnp.maximum(pivots, _EPS))  # (..., 4)
    s0, s1, s2, s3 = S[..., 0], S[..., 1], S[..., 2], S[..., 3]
    cand = jnp.stack(
        [
            jnp.stack(
                [(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, s0 / 4], axis=-1
            ),
            jnp.stack(
                [s1 / 4, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], axis=-1
            ),
            jnp.stack(
                [(m01 + m10) / s2, s2 / 4, (m12 + m21) / s2, (m02 - m20) / s2], axis=-1
            ),
            jnp.stack(
                [(m02 + m20) / s3, (m12 + m21) / s3, s3 / 4, (m10 - m01) / s3], axis=-1
            ),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4 [x,y,z,w])
    best = jnp.argmax(pivots, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=R.dtype)  # (..., 4)
    q = jnp.sum(cand * onehot[..., None], axis=-2)
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

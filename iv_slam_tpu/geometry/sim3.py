"""Batched Sim(3) operations (g2o sim3.h equivalents, JAX-native).

A Sim3 is stored as (R (3, 3), t (3,), s ()) with action x -> s R x + t.
Tangent vectors are 7-dim (omega, upsilon, sigma) — rotation, translation,
log-scale — matching g2o's ordering for types_seven_dof_expmap edges.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import se3

_EPS = 1e-24


class Sim3(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray

    def act(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.asarray(self.s)[..., None]
        if x.ndim > self.t.ndim:  # (.., N, 3) points under unbatched Sim3
            s = s[..., None]
            t = self.t[..., None, :]
        else:
            t = self.t
        return s * (x @ jnp.swapaxes(self.R, -1, -2)) + t

    def compose(self, other: "Sim3") -> "Sim3":
        """self o other: (self * other)(x) = self(other(x))."""
        s = jnp.asarray(self.s)[..., None]
        return Sim3(
            R=self.R @ other.R,
            t=s * (self.R @ other.t[..., None])[..., 0] + self.t,
            s=self.s * other.s,
        )

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        s_inv = 1.0 / self.s
        return Sim3(
            R=Rt,
            t=-jnp.asarray(s_inv)[..., None] * (Rt @ self.t[..., None])[..., 0],
            s=s_inv,
        )

    @staticmethod
    def identity(dtype=jnp.float32) -> "Sim3":
        return Sim3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype), jnp.float32(1.0))

    @staticmethod
    def from_se3(T: jnp.ndarray, s=None) -> "Sim3":
        return Sim3(
            T[..., :3, :3], T[..., :3, 3],
            jnp.float32(1.0) if s is None else s,
        )

    def to_se3(self) -> jnp.ndarray:
        """Collapse to SE3 with t/s scaling (used when correcting map points
        after loop closure: [R, t/s])."""
        return se3.rt_to_mat(self.R, self.t / self.s)


def _calc_w(w: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim3 left-Jacobian-like W matrix with t = W v (Strasdat's
    closed form): W = A W_hat + B W_hat^2 + C I."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = se3.hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    s = jnp.exp(sigma)
    small_t = theta2 < 1e-4
    small_s = jnp.abs(sigma) < 1e-3
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sigma_safe = jnp.where(small_s, 1.0, sigma)
    theta_safe = jnp.where(small_t, 1.0, theta)
    theta2_safe = jnp.where(small_t, 1.0, theta2)
    c = theta2 + sigma * sigma

    C = jnp.where(small_s, 1.0, (s - 1.0) / sigma_safe)
    # general case
    a_g = s * st
    b_g = s * ct
    A_gen = (a_g * sigma + (1.0 - b_g) * theta) / (
        theta_safe * jnp.where(c > _EPS, c, 1.0)
    )
    B_gen = (C - ((b_g - 1.0) * sigma + a_g * theta)
             / jnp.where(c > _EPS, c, 1.0)) / theta2_safe
    # sigma ~ 0 fallbacks
    A_s0 = (1.0 - ct) / theta2_safe
    B_s0 = (theta - st) / (theta2_safe * theta_safe)
    # theta ~ 0 fallbacks
    A_t0 = ((sigma - 1.0) * s + 1.0) / (sigma_safe * sigma_safe)
    B_t0 = (
        (0.5 * sigma * sigma - sigma + 1.0) * s - 1.0 - 0.5 * sigma * sigma
    ) / (sigma_safe ** 3)
    A = jnp.where(small_t, jnp.where(small_s, 0.5, A_t0),
                  jnp.where(small_s, A_s0, A_gen))
    B = jnp.where(small_t, jnp.where(small_s, 1.0 / 6.0, B_t0),
                  jnp.where(small_s, B_s0, B_gen))
    return (
        A[..., None, None] * W
        + B[..., None, None] * W2
        + C[..., None, None] * eye
    )


def sim3_exp(xi: jnp.ndarray) -> Sim3:
    """(..., 7) (omega, upsilon, sigma) -> Sim3 (Strasdat closed form, as
    g2o sim3.h)."""
    w, v, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = se3.so3_exp(w)
    Wmat = _calc_w(w, sigma)
    t = (Wmat @ v[..., None])[..., 0]
    return Sim3(R, t, jnp.exp(sigma))


def sim3_log(S: Sim3) -> jnp.ndarray:
    """Sim3 -> (..., 7). Inverse of sim3_exp via solving W xi_v = t."""
    w = se3.so3_log(S.R)
    sigma = jnp.log(S.s)
    sigma = jnp.broadcast_to(sigma, w.shape[:-1])
    sigma_col = sigma[..., None]
    Wmat = _calc_w(w, sigma)
    v = jnp.linalg.solve(Wmat, S.t[..., None])[..., 0]
    return jnp.concatenate([w, v, sigma_col], axis=-1)

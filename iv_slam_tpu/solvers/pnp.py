"""Robust PnP for relocalization (src/PnPsolver.cc role).

The reference uses EPnP (4 control points + Gauss-Newton on betas) inside a
sequential RANSAC (SetRansacParameters(0.99, 10, 300, 4, 0.5, 5.991),
Tracking.cc:2317). The TPU formulation keeps the same funnel — minimal-
sample RANSAC gated at chi2 5.991 * sigma2, followed by motion-only LM on
the inliers — but solves each hypothesis with a batched 6-point DLT
(one vmapped 12x12 SVD per hypothesis, all hypotheses in one device
program) instead of EPnP's beta-case analysis: equivalent accuracy for the
relocalization use case, far better machine shape.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3


class PnPResult(NamedTuple):
    T: jnp.ndarray         # (4, 4) Tcw
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray        # () bool: enough inliers found


def _dlt_pose(X: jnp.ndarray, uv_n: jnp.ndarray) -> jnp.ndarray:
    """DLT: world points (S, 3) + normalized image points (S, 2) -> (3, 4)
    projection [R|t] with orthonormalized R (SVD cleanup)."""
    s = X.shape[0]
    zeros = jnp.zeros((s, 4))
    Xh = jnp.concatenate([X, jnp.ones((s, 1))], axis=1)
    rows_u = jnp.concatenate([Xh, zeros, -uv_n[:, :1] * Xh], axis=1)
    rows_v = jnp.concatenate([zeros, Xh, -uv_n[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2S, 12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    # fix sign: points should have positive depth
    depths = Xh @ P[2]
    P = P * jnp.where(jnp.sum(depths) < 0, -1.0, 1.0)
    R_raw = P[:, :3]
    U, S, Vt2 = jnp.linalg.svd(R_raw)
    scale = jnp.mean(S)
    R = U @ Vt2
    det = jnp.linalg.det(R)
    U_fix = U.at[:, 2].multiply(jnp.sign(det))
    R = U_fix @ Vt2
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    return se3.rt_to_mat(R, t)


@functools.partial(jax.jit, static_argnames=("n_hyp", "sample_size"))
def pnp_ransac(
    Xw: jnp.ndarray,       # (N, 3) world points
    uv: jnp.ndarray,       # (N, 2) observed pixels
    sigma2: jnp.ndarray,   # (N,) octave variance
    valid: jnp.ndarray,    # (N,) bool
    fx, fy, cx, cy,
    key: jnp.ndarray,
    n_hyp: int = 300,
    sample_size: int = 6,
    min_inliers: int = 10,
) -> PnPResult:
    n = Xw.shape[0]
    # sample only from valid indices (gumbel trick over masked logits)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    keys = jax.random.split(key, n_hyp)

    def sample(k):
        return jax.random.choice(
            k, n, shape=(sample_size,), replace=False,
            p=jnp.where(valid, 1.0, 0.0) / jnp.maximum(jnp.sum(valid), 1),
        )

    idx = jax.vmap(sample)(keys)  # (H, S)

    uv_n = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=1)

    def hyp(sample_idx):
        return _dlt_pose(Xw[sample_idx], uv_n[sample_idx])

    Ts = jax.vmap(hyp)(idx)  # (H, 4, 4)

    pc = jnp.einsum("hij,nj->hni", Ts[:, :3, :3], Xw) + Ts[:, None, :3, 3]
    z = pc[..., 2]
    u = fx * pc[..., 0] / jnp.maximum(z, 1e-9) + cx
    v = fy * pc[..., 1] / jnp.maximum(z, 1e-9) + cy
    e2 = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
    inl = (z > 0) & (e2 < 5.991 * sigma2[None]) & valid[None]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    return PnPResult(
        T=Ts[best],
        inliers=inl[best],
        n_inliers=counts[best],
        ok=counts[best] >= min_inliers,
    )

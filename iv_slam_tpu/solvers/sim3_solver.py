"""Sim(3) estimation: Horn closed-form + batched RANSAC
(src/Sim3Solver.cc re-designed).

The reference draws 3-point minimal samples sequentially and checks
reprojection inliers one hypothesis at a time. TPU shape: all H hypotheses
are computed in one vmapped closed-form solve and all H x N reprojection
checks in one batched pass — RANSAC as a single device program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Sim3Result(NamedTuple):
    R: jnp.ndarray        # (3, 3)
    t: jnp.ndarray        # (3,)
    s: jnp.ndarray        # ()
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray


def horn_sim3(P1: jnp.ndarray, P2: jnp.ndarray, fix_scale: bool = False):
    """Closed-form similarity P2 ~ s R P1 + t from paired (N, 3) points
    (Horn 1987, as Sim3Solver::ComputeSim3)."""
    c1 = P1.mean(axis=0)
    c2 = P2.mean(axis=0)
    X1 = P1 - c1
    X2 = P2 - c2
    M = X1.T @ X2  # S[i][j] = sum x1_i * x2_j (Horn's correlation matrix)
    # quaternion eigen-decomposition form of Horn's method
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    vals, vecs = jnp.linalg.eigh(N)
    q = vecs[:, -1]  # [w, x, y, z]
    w, x, y, z = q[0], q[1], q[2], q[3]
    R = jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        # Horn symmetric scale: sqrt(sum|X2|^2 / sum|RX1|^2) — the reference
        # uses s = D / Sxx_rot form; ratio of projections onto rotated X1
        num = jnp.sum(X2 * (X1 @ R.T))
        den = jnp.sum(X1 * X1)
        s = num / jnp.maximum(den, 1e-12)
    t = c2 - s * (R @ c1)
    return R, t, s


@functools.partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac(
    P1: jnp.ndarray,        # (N, 3) points in frame 1 camera coords
    P2: jnp.ndarray,        # (N, 3) matched points in frame 2 camera coords
    uv1: jnp.ndarray,       # (N, 2) observed pixels in frame 1
    uv2: jnp.ndarray,       # (N, 2) observed pixels in frame 2
    sigma2: jnp.ndarray,    # (N,) per-match scale variance
    valid: jnp.ndarray,     # (N,) bool
    fx, fy, cx, cy,
    key: jnp.ndarray,
    n_hyp: int = 300,
    fix_scale: bool = False,
    n_valid=None,
) -> Sim3Result:
    """Batched RANSAC with the reference's acceptance test: reprojection
    error < 9.210 * sigma2 (th2 per Sim3Solver::CheckInliers) in *both*
    directions.

    ``n_valid``: traced count of real correspondences when the arrays are
    a valid prefix padded to a fixed capacity (the loop-closing call
    shape). Hypothesis triples are drawn from [0, n_valid) only — the
    reference's Sim3Solver samples mvAllIndices, i.e. actual matches; a
    uniform draw over the padded capacity would contaminate essentially
    every 3-sample with padding rows ((m/N)^3 clean-hypothesis odds).
    The compiled shape stays fixed: n_valid rides as a device scalar."""
    n = P1.shape[0]
    hi = jnp.maximum(n, 1) if n_valid is None \
        else jnp.maximum(jnp.asarray(n_valid, jnp.int32), 1)
    idx = jax.random.randint(key, (n_hyp, 3), 0, hi)

    def hyp(sample_idx):
        return horn_sim3(P1[sample_idx], P2[sample_idx], fix_scale)

    Rs, ts, ss = jax.vmap(hyp)(idx)  # (H, 3, 3), (H, 3), (H,)

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-9)
        return jnp.stack(
            [fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], axis=-1
        )

    # transform both directions: P1 -> frame2, P2 -> frame1
    P1in2 = ss[:, None, None] * jnp.einsum("hij,nj->hni", Rs, P1) + ts[:, None]
    Rinv = jnp.swapaxes(Rs, 1, 2)
    P2in1 = jnp.einsum(
        "hij,hnj->hni", Rinv, (P2[None] - ts[:, None]) / ss[:, None, None]
    )
    e2 = jnp.sum((project(P1in2) - uv2[None]) ** 2, axis=-1)
    e1 = jnp.sum((project(P2in1) - uv1[None]) ** 2, axis=-1)
    th = 9.210 * sigma2[None]
    inl = (e1 < th) & (e2 < th) & valid[None]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    return Sim3Result(
        R=Rs[best], t=ts[best], s=ss[best],
        inliers=inl[best], n_inliers=counts[best],
    )

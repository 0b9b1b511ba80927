"""Robust PnP for relocalization (src/PnPsolver.cc role).

The reference uses EPnP (4 control points + Gauss-Newton on betas) inside a
sequential RANSAC (SetRansacParameters(0.99, 10, 300, 4, 0.5, 5.991),
Tracking.cc:2317). The TPU formulation keeps the same funnel — 4-point
minimal-sample RANSAC gated at chi2 5.991 * sigma2, followed by motion-only
LM on the inliers — and solves each hypothesis with the same EPnP algorithm
(PnPsolver.cc:376-470 compute_pose: control points -> barycentric M ->
12x12 null-space -> beta cases N=1..3 + Gauss-Newton -> Horn alignment),
reshaped for the MXU: every small eigen/solve is fixed-size and vmapped, so
all 300 hypotheses x 3 beta cases run in ONE device program. A batched
6-point DLT (`_dlt_pose`) is kept as an alternative hypothesis solver.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


# ---------------------------------------------------------------- EPnP
# (Lepetit et al. 2009, as vendored in PnPsolver.cc)

# control-point pair indexing for the 6 inter-point distance constraints
_PAIRS = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])


def _beta_products(b: jnp.ndarray) -> jnp.ndarray:
    """betas (4,) -> the 10 quadratic monomials matching L_6x10's column
    order [b00,b01,b11,b02,b12,b22,b03,b13,b23,b33] (PnPsolver.cc:770-797)."""
    b0, b1, b2, b3 = b[0], b[1], b[2], b[3]
    return jnp.stack([
        b0 * b0, b0 * b1, b1 * b1, b0 * b2, b1 * b2,
        b2 * b2, b0 * b3, b1 * b3, b2 * b3, b3 * b3,
    ])


def _gauss_newton_betas(L: jnp.ndarray, rho: jnp.ndarray,
                        betas: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Refine betas on the 6 control-point distance equations
    (PnPsolver.cc:832-858, 5 iterations)."""

    def resid(b):
        return L @ _beta_products(b) - rho

    def body(b, _):
        J = jax.jacfwd(resid)(b)               # (6, 4)
        r = resid(b)
        JtJ = J.T @ J + 1e-9 * jnp.eye(4)
        b = b - jnp.linalg.solve(JtJ, J.T @ r)
        return b, None

    betas, _ = jax.lax.scan(body, betas, None, length=iters)
    return betas


def _horn_rt(pw: jnp.ndarray, pc: jnp.ndarray) -> jnp.ndarray:
    """Closed-form R, t with camera points from world points
    (estimate_R_and_t, PnPsolver.cc:875-931)."""
    cw = pw.mean(axis=0)
    cc = pc.mean(axis=0)
    A = (pc - cc).T @ (pw - cw)
    U, _, Vt = jnp.linalg.svd(A)
    U = U.at[:, 2].multiply(jnp.sign(jnp.linalg.det(U @ Vt)))
    R = U @ Vt
    t = cc - R @ cw
    return se3.rt_to_mat(R, t)


def _epnp_pose(X: jnp.ndarray, uv_n: jnp.ndarray) -> jnp.ndarray:
    """EPnP on one minimal sample: world points (S, 3) + normalized image
    points (S, 2) -> (4, 4) Tcw. Degenerate samples produce NaN poses,
    which the RANSAC scorer rejects naturally."""
    s = X.shape[0]
    # control points: centroid + principal directions (choose_control_points,
    # PnPsolver.cc:232-262)
    c0 = X.mean(axis=0)
    Xc = X - c0
    w, V = jnp.linalg.eigh(Xc.T @ Xc)           # ascending eigenvalues
    k = jnp.sqrt(jnp.maximum(w[::-1], 0.0) / s)
    cws = jnp.concatenate([c0[None], c0[None] + k[:, None] * V.T[::-1]], 0)
    # barycentric coordinates (compute_barycentric_coordinates, 264-288)
    CC = (cws[1:] - cws[0]).T
    a123 = jnp.linalg.solve(
        CC + 1e-12 * jnp.eye(3), (X - cws[0]).T
    ).T                                          # (S, 3)
    alphas = jnp.concatenate([1.0 - a123.sum(1, keepdims=True), a123], 1)
    # M rows (fill_M, 290-306) in normalized coords (fu=fv=1, uc=vc=0)
    zeros = jnp.zeros_like(alphas)
    ru = jnp.stack([alphas, zeros, -uv_n[:, 0:1] * alphas], 2).reshape(s, 12)
    rv = jnp.stack([zeros, alphas, -uv_n[:, 1:2] * alphas], 2).reshape(s, 12)
    M = jnp.concatenate([ru, rv], 0)             # (2S, 12)
    _, Vm = jnp.linalg.eigh(M.T @ M)             # ascending
    vs = Vm.T[:4].reshape(4, 4, 3)               # 4 null vectors, smallest first
    # L_6x10 + rho (compute_L_6x10 / compute_rho, 744-806)
    dv = vs[:, _PAIRS[:, 0]] - vs[:, _PAIRS[:, 1]]   # (4, 6, 3)
    dot = jnp.einsum("aij,bij->abi", dv, dv)         # (4, 4, 6)
    L = jnp.stack([
        dot[0, 0], 2 * dot[0, 1], dot[1, 1], 2 * dot[0, 2], 2 * dot[1, 2],
        dot[2, 2], 2 * dot[0, 3], 2 * dot[1, 3], 2 * dot[2, 3], dot[3, 3],
    ], axis=1)                                       # (6, 10)
    dcw = cws[_PAIRS[:, 0]] - cws[_PAIRS[:, 1]]
    rho = jnp.sum(dcw * dcw, axis=1)                 # (6,)

    def lsq(cols):
        Ls = L[:, jnp.asarray(cols)]
        return jnp.linalg.solve(
            Ls.T @ Ls + 1e-12 * jnp.eye(len(cols)), Ls.T @ rho
        )

    # beta approximations N=1..3 (find_betas_approx_{1,2,3}, 674-742)
    b4 = lsq((0, 1, 3, 6))      # [b00, b01, b02, b03]
    s0 = jnp.sign(b4[0]) + (b4[0] == 0)
    beta1 = jnp.concatenate(
        [jnp.sqrt(jnp.abs(b4[:1])), s0 * b4[1:] / jnp.sqrt(jnp.abs(b4[:1]))]
    )
    b3 = lsq((0, 1, 2))         # [b00, b01, b11]
    b1_2 = jnp.sqrt(jnp.abs(b3[0])) * jnp.sign(b3[1])
    b2_2 = jnp.where(b3[0] * b3[2] > 0, jnp.sqrt(jnp.abs(b3[2])), 0.0)
    beta2 = jnp.stack([b1_2, b2_2, 0.0, 0.0])
    b5 = lsq((0, 1, 2, 3, 4))   # [b00, b01, b11, b02, b12]
    c1 = jnp.sqrt(jnp.abs(b5[0])) * jnp.sign(b5[1])
    c2 = jnp.where(b5[0] * b5[2] > 0, jnp.sqrt(jnp.abs(b5[2])), 0.0)
    c3 = b5[3] / jnp.where(c1 == 0, 1.0, c1)
    beta3 = jnp.stack([c1, c2, c3, 0.0])

    def case(b0):
        b = _gauss_newton_betas(L, rho, b0)
        ccs = jnp.einsum("i,ijk->jk", b, vs)         # (4, 3) cam control pts
        pcs = alphas @ ccs                           # (S, 3)
        flip = jnp.where(pcs[0, 2] < 0, -1.0, 1.0)   # solve_for_sign
        T = _horn_rt(X, pcs * flip)
        pc = X @ T[:3, :3].T + T[:3, 3]
        uvp = pc[:, :2] / jnp.maximum(pc[:, 2:3], 1e-12)
        err = jnp.sum((uvp - uv_n) ** 2)
        err = jnp.where(jnp.isfinite(err) & (pc[:, 2].min() > 0), err, jnp.inf)
        return T, err

    Ts, errs = jax.vmap(case)(jnp.stack([beta1, beta2, beta3]))
    return Ts[jnp.argmin(errs)]


@functools.partial(jax.jit, static_argnames=("n_hyp", "sample_size", "solver"))
def pnp_ransac(
    Xw: jnp.ndarray,       # (N, 3) world points
    uv: jnp.ndarray,       # (N, 2) observed pixels
    sigma2: jnp.ndarray,   # (N,) octave variance
    valid: jnp.ndarray,    # (N,) bool
    fx, fy, cx, cy,
    key: jnp.ndarray,
    n_hyp: int = 300,
    sample_size: int = 4,
    min_inliers: int = 10,
    solver: str = "epnp",
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

    hyp_solver = _epnp_pose if solver == "epnp" else _dlt_pose

    def hyp(sample_idx):
        return hyp_solver(Xw[sample_idx], uv_n[sample_idx])

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

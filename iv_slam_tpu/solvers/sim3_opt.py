"""Sim3 relative-pose refinement over matched map points
(Optimizer::OptimizeSim3, Optimizer.cc:2018-2216).

Given matched map points between two keyframes, optimize the Sim3 S12 with
mutual reprojection edges: point j of KF2 projected into KF1 through S12,
and point i of KF1 projected into KF2 through S12^-1. Huber delta
sqrt(10); outliers (chi2 > 10) removed once, then more iterations —
the reference's two-stage schedule. Batched LM on a single 7-dof variable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3 as s3

TH2 = 10.0
MAX_TRIALS = 10


class Sim3OptResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("fix_scale", "n_iters"))
def optimize_sim3(
    R0, t0, s0,              # initial S12
    P1: jnp.ndarray,         # (N, 3) map points in KF1 camera frame
    P2: jnp.ndarray,         # (N, 3) matched map points in KF2 camera frame
    uv1: jnp.ndarray,        # (N, 2) observations in KF1
    uv2: jnp.ndarray,        # (N, 2) observations in KF2
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    fx, fy, cx, cy,
    fix_scale: bool = False,
    n_iters: int = 10,
) -> Sim3OptResult:
    def project(p):
        z = jnp.maximum(p[..., 2], 1e-9)
        return jnp.stack(
            [fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], axis=-1
        )

    def residuals(xi, R, t, s):
        S = s3.sim3_exp(xi).compose(s3.Sim3(R, t, s))
        e1 = uv1 - project(S.act(P2))            # KF2 points into KF1
        e2 = uv2 - project(S.inverse().act(P1))  # KF1 points into KF2
        return e1, e2

    def chi2s(xi, R, t, s):
        e1, e2 = residuals(xi, R, t, s)
        c1 = inv_sigma2_1 * jnp.sum(e1 * e1, axis=-1)
        c2 = inv_sigma2_2 * jnp.sum(e2 * e2, axis=-1)
        return c1, c2

    def total_cost(xi, R, t, s, mask):
        c1, c2 = chi2s(xi, R, t, s)
        delta = jnp.sqrt(TH2)

        def huber(c):
            return jnp.where(
                c <= TH2, c, 2.0 * delta * jnp.sqrt(jnp.maximum(c, 1e-12)) - TH2
            )

        return jnp.sum(jnp.where(mask, huber(c1) + huber(c2), 0.0))

    def lm(R, t, s, mask, iters):
        def build(Rc, tc, sc):
            def res_flat(xi):
                e1, e2 = residuals(xi, Rc, tc, sc)
                w1 = jnp.sqrt(inv_sigma2_1 * mask)
                w2 = jnp.sqrt(inv_sigma2_2 * mask)
                return jnp.concatenate(
                    [(e1 * w1[:, None]).reshape(-1), (e2 * w2[:, None]).reshape(-1)]
                )

            zero = jnp.zeros(7)
            e = res_flat(zero)
            J = jax.jacfwd(res_flat)(zero)
            if fix_scale:
                J = J.at[:, 6].set(0.0)
            H = J.T @ J
            g = -J.T @ e
            return H, g

        def iteration(it, carry):
            Rc, tc, sc, lam, ni, chi = carry
            H, g = build(Rc, tc, sc)
            lam0 = jnp.where(it == 0, 1e-5 * jnp.max(jnp.abs(jnp.diag(H))) + 1e-9, lam)
            ni0 = jnp.where(it == 0, 2.0, ni)

            def trial_cond(tc_):
                *_, rho, trials, done = tc_
                return (~done) & (rho < 0) & (trials < MAX_TRIALS)

            def trial(tc_):
                R_c, t_c, s_c, lam_c, ni_c, chi_c, _, trials, _ = tc_
                diag = jnp.where(
                    (jnp.arange(7) == 6) & fix_scale, 1.0, lam_c
                )
                dx = jnp.linalg.solve(H + jnp.diag(diag + 1e-12), g)
                if fix_scale:
                    dx = dx.at[6].set(0.0)
                S_new = s3.sim3_exp(dx).compose(s3.Sim3(R_c, t_c, s_c))
                chi_new = total_cost(jnp.zeros(7), S_new.R, S_new.t, S_new.s, mask)
                rho = (chi_c - chi_new) / (jnp.dot(dx, lam_c * dx + g) + 1e-3)
                good = (rho > 0) & jnp.isfinite(chi_new)
                alpha = 1.0 - (2.0 * rho - 1.0) ** 3
                return (
                    jnp.where(good, S_new.R, R_c),
                    jnp.where(good, S_new.t, t_c),
                    jnp.where(good, S_new.s, s_c),
                    jnp.where(good, lam_c * jnp.clip(alpha, 1 / 3, 2 / 3),
                              lam_c * ni_c),
                    jnp.where(good, 2.0, ni_c * 2.0),
                    jnp.where(good, chi_new, chi_c),
                    rho, trials + 1, good,
                )

            Rn, tn, sn, lam2, ni2, chi2_, *_ = jax.lax.while_loop(
                trial_cond, trial,
                (Rc, tc, sc, lam0, ni0, chi, -1.0, 0, False),
            )
            return (Rn, tn, sn, lam2, ni2, chi2_)

        chi_init = total_cost(jnp.zeros(7), R, t, s, mask)
        R2, t2, s2, *_ = jax.lax.fori_loop(
            0, iters, iteration, (R, t, s, 0.0, 2.0, chi_init)
        )
        return R2, t2, s2

    mask0 = valid.astype(jnp.float32)
    R1, t1, s1 = lm(R0, t0, s0, mask0, 5)
    c1, c2 = chi2s(jnp.zeros(7), R1, t1, s1)
    inlier = valid & (c1 <= TH2) & (c2 <= TH2)
    R2, t2, s2 = lm(R1, t1, s1, inlier.astype(jnp.float32), n_iters)
    c1, c2 = chi2s(jnp.zeros(7), R2, t2, s2)
    final = valid & (c1 <= TH2) & (c2 <= TH2)
    return Sim3OptResult(
        R=R2, t=t2, s=s2, inliers=final,
        n_inliers=jnp.sum(final.astype(jnp.int32)),
    )

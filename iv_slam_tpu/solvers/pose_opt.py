"""Motion-only pose optimization: batched Levenberg-Marquardt over SE(3).

TPU-native replacement for Optimizer::PoseOptimization (Optimizer.cc:251-503),
which the reference runs through g2o (VertexSE3Expmap + unary mono/stereo
reprojection edges, dense 6x6 solve). Semantics reproduced:

  * unary edges: residual = obs - proj(T X), information = I * invLevelSigma2
  * Huber robust kernel with quality-scaled delta:
      delta = sqrt(5.991) * qual (mono) / sqrt(7.815) * qual (stereo)
    (Optimizer.cc:340-342, 378-380 — the IV-SLAM introspection hook)
  * g2o Levenberg damping: additive lambda, init = 1e-5 * max(diag H),
    accept if rho > 0 with lambda *= max(1/3, min(2/3, 1-(2rho-1)^3)),
    reject with lambda *= ni, ni *= 2, up to 10 trials per iteration
  * 4 rounds x 10 iterations; every round restarts from the initial pose
    with the surviving inlier set; outliers reclassified by unrobust chi2
    vs {5.991, 7.815}; the robust kernel is dropped after round
    min(2, n_rounds-2) (Optimizer.cc:407-494)

All N edges live in fixed-size arrays with validity masks; each LM step is
a handful of (N, 6) einsums + one 6x6 solve, so the whole optimization jits
into a single XLA program with no host round-trips.

Deviation from g2o: early-termination heuristics (the "stop if relative chi2
gain < 1e-3 three times" rule) are not replicated — we always run the fixed
iteration budget, which can only improve the result.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry import camera, se3

DELTA_MONO_SQ = 5.991
DELTA_STEREO_SQ = 7.815
MAX_TRIALS = 10


class PoseOptResult(NamedTuple):
    T: jnp.ndarray          # (4, 4) optimized Tcw
    inlier: jnp.ndarray     # (N,) bool (valid edges classified inlier)
    chi2: jnp.ndarray       # (N,) float32 final unrobust chi2 (logging mode)
    n_inliers: jnp.ndarray  # () int32


def _residuals(T, Xw, obs, is_stereo, K):
    """e = obs - proj(T X); mono edges zero their third component."""
    pc = se3.transform_points(T, Xw)
    pred = camera.project_stereo(K, pc)
    e = obs - pred
    e = e.at[:, 2].set(jnp.where(is_stereo, e[:, 2], 0.0))
    return e, pc


def _jacobian(pc, is_stereo, K):
    """de/dxi for left-multiplied update exp(xi) T, xi = (omega, upsilon).

    d(exp(xi) p)/dxi = [-hat(p) | I]  =>  J = Jproj @ [hat(p) | -I]
    (verified against autodiff in tests/test_pose_opt.py).
    """
    Jp = camera.proj_jacobian_stereo(K, pc)  # (N, 3, 3)
    hat_p = se3.hat(pc)  # (N, 3, 3)
    left = jnp.einsum("nij,njk->nik", Jp, hat_p)
    J = jnp.concatenate([left, -Jp], axis=-1)  # (N, 3, 6)
    J = J.at[:, 2, :].set(
        jnp.where(is_stereo[:, None], J[:, 2, :], 0.0)
    )
    return J


def _chi2(e, inv_sigma2, is_stereo):
    return inv_sigma2 * jnp.sum(e * e, axis=-1)


def _huber_rho0(chi2, delta_sq, active):
    """Robust cost rho0 (g2o RobustKernelHuber) when the kernel is active."""
    delta = jnp.sqrt(delta_sq)
    lin = 2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - delta_sq
    rob = jnp.where(chi2 <= delta_sq, chi2, lin)
    return jnp.where(active, rob, chi2)


def _huber_w(chi2, delta_sq, active):
    """IRLS weight rho1 = delta/|e| outside the inlier band."""
    w = jnp.where(
        chi2 <= delta_sq,
        1.0,
        jnp.sqrt(delta_sq / jnp.maximum(chi2, 1e-12)),
    )
    return jnp.where(active, w, 1.0)


def _total_cost(T, Xw, obs, inv_sigma2, delta_sq, is_stereo, mask, K, kernel_on):
    e, _ = _residuals(T, Xw, obs, is_stereo, K)
    c2 = _chi2(e, inv_sigma2, is_stereo)
    rob = _huber_rho0(c2, delta_sq, kernel_on)
    return jnp.sum(jnp.where(mask, rob, 0.0))


def _lm_round(
    T0, Xw, obs, inv_sigma2, delta_sq, is_stereo, mask, K, kernel_on, n_iters
):
    """One g2o-style LM round from T0 over the masked edge set."""

    def build(T):
        e, pc = _residuals(T, Xw, obs, is_stereo, K)
        c2 = _chi2(e, inv_sigma2, is_stereo)
        w = _huber_w(c2, delta_sq, kernel_on) * inv_sigma2
        w = jnp.where(mask, w, 0.0)
        J = _jacobian(pc, is_stereo, K)  # (N, 3, 6)
        H = jnp.einsum("nri,n,nrj->ij", J, w, J)
        g = -jnp.einsum("nri,n,nr->i", J, w, e)  # rhs: -J^T W e
        return H, g

    chi0 = _total_cost(T0, Xw, obs, inv_sigma2, delta_sq, is_stereo, mask, K,
                       kernel_on)

    def iteration(it, carry):
        T, lam, ni, chi = carry
        H, g = build(T)
        lam0 = jnp.where(
            it == 0, 1e-5 * jnp.max(jnp.abs(jnp.diagonal(H))), lam
        )
        ni0 = jnp.where(it == 0, 2.0, ni)

        def trial_cond(tc):
            _, _, _, _, rho, trials, done = tc
            return (~done) & (rho < 0) & (trials < MAX_TRIALS)

        def trial(tc):
            T_cur, lam_c, ni_c, chi_c, _, trials, _ = tc
            Hd = H + jnp.diag(jnp.full(6, 1.0) * lam_c)
            dx = jnp.linalg.solve(Hd, g)
            T_new = se3.se3_exp(dx) @ T_cur
            chi_new = _total_cost(
                T_new, Xw, obs, inv_sigma2, delta_sq, is_stereo, mask, K,
                kernel_on,
            )
            scale = jnp.dot(dx, lam_c * dx + g) + 1e-3
            rho = (chi_c - chi_new) / scale
            good = (rho > 0) & jnp.isfinite(chi_new)
            alpha = 1.0 - (2.0 * rho - 1.0) ** 3
            lam_good = lam_c * jnp.clip(alpha, 1.0 / 3.0, 2.0 / 3.0)
            return (
                jnp.where(good, T_new, T_cur),
                jnp.where(good, lam_good, lam_c * ni_c),
                jnp.where(good, 2.0, ni_c * 2.0),
                jnp.where(good, chi_new, chi_c),
                rho,
                trials + 1,
                good,
            )

        T2, lam2, ni2, chi2_, _, _, _ = jax.lax.while_loop(
            trial_cond, trial, (T, lam0, ni0, chi, -1.0, 0, False)
        )
        return (T2, lam2, ni2, chi2_)

    T_fin, _, _, _ = jax.lax.fori_loop(
        0, n_iters, iteration, (T0, 0.0, 2.0, chi0)
    )
    return T_fin


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_iters"))
def pose_optimization(
    T0: jnp.ndarray,          # (4, 4) initial Tcw
    Xw: jnp.ndarray,          # (N, 3) world points
    obs: jnp.ndarray,         # (N, 3) [u, v, u_r]; u_r < 0 => mono edge
    inv_sigma2: jnp.ndarray,  # (N,) per-octave information
    qual: jnp.ndarray,        # (N,) introspection quality scores (1 = clean)
    valid: jnp.ndarray,       # (N,) bool edge exists
    K: camera.Intrinsics,
    n_rounds: int = 4,
    n_iters: int = 10,
) -> PoseOptResult:
    is_stereo = obs[:, 2] >= 0
    delta_base_sq = jnp.where(is_stereo, DELTA_STEREO_SQ, DELTA_MONO_SQ)
    # quality scales the Huber *delta* (not delta^2): delta' = delta * qual
    delta_sq = delta_base_sq * qual * qual
    chi2_th = delta_base_sq

    inlier = valid

    def round_body(r, inlier):
        # the kernel is removed during the classification pass of round
        # min(2, n_rounds-2), so later rounds optimize without it
        kernel_on = r <= min(2, n_rounds - 2)
        T_r = _lm_round(
            T0, Xw, obs, inv_sigma2, delta_sq, is_stereo,
            valid & inlier, K, kernel_on, n_iters,
        )
        e, _ = _residuals(T_r, Xw, obs, is_stereo, K)
        c2 = _chi2(e, inv_sigma2, is_stereo)
        new_inlier = valid & (c2 <= chi2_th)
        return new_inlier, T_r, c2

    # unrolled python loop (n_rounds is tiny and static)
    T_cur = T0
    c2 = jnp.zeros(Xw.shape[0], jnp.float32)
    for r in range(n_rounds):
        inlier, T_cur, c2 = round_body(r, inlier)

    return PoseOptResult(
        T=T_cur,
        inlier=inlier,
        chi2=c2,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
    )

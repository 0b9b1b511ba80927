"""Sim(3) pose-graph optimization for loop closure
(Optimizer::OptimizeEssentialGraph, Optimizer.cc:1753-2016).

Vertices are per-keyframe Sim3 world->camera transforms; edges (loop
connections, spanning tree, covisibility >= 100) constrain relative Sim3s.
The reference runs g2o LM with numeric Jacobians over a sparse graph; here
every edge residual e = log(S_meas * S_i * S_j^-1) and its two 7x7
Jacobians come from one vmapped jacfwd, the Hessian is assembled by block
scatter-add, and the (7K, 7K) system is a dense Cholesky solve — at
essential-graph scale (hundreds of keyframes) dense beats sparse on the
MXU by a wide margin.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3 as s3

MAX_TRIALS = 8


class EGProblem(NamedTuple):
    R: jnp.ndarray        # (K, 3, 3) initial S_cw rotations
    t: jnp.ndarray        # (K, 3)
    s: jnp.ndarray        # (K,)
    fixed: jnp.ndarray    # (K,) bool
    e_i: jnp.ndarray      # (E,) int32
    e_j: jnp.ndarray      # (E,)
    e_R: jnp.ndarray      # (E, 3, 3) measured S_ji rotation
    e_t: jnp.ndarray      # (E, 3)
    e_s: jnp.ndarray      # (E,)
    e_valid: jnp.ndarray  # (E,) bool


def _edge_residual(xi_i, xi_j, Si, Sj, Sm):
    """e = log(S_meas * exp(xi_i) S_i * (exp(xi_j) S_j)^-1), 7-vector."""
    Pi = s3.sim3_exp(xi_i).compose(Si)
    Pj = s3.sim3_exp(xi_j).compose(Sj)
    return s3.sim3_log(Sm.compose(Pi).compose(Pj.inverse()))


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_essential_graph(prob: EGProblem, n_iters: int = 20,
                             fix_scale: bool = False):
    """fix_scale=True pins every vertex's log-scale coordinate (g2o
    VertexSim3Expmap::_fix_scale, used for stereo/RGBD loop closure)."""
    K = prob.R.shape[0]
    E = prob.e_i.shape[0]
    zero7 = jnp.zeros(7)

    def residuals_and_jacs(R, t, s):
        Si = s3.Sim3(R[prob.e_i], t[prob.e_i], s[prob.e_i])
        Sj = s3.Sim3(R[prob.e_j], t[prob.e_j], s[prob.e_j])
        Sm = s3.Sim3(prob.e_R, prob.e_t, prob.e_s)

        def one(si_R, si_t, si_s, sj_R, sj_t, sj_s, m_R, m_t, m_s):
            Si_ = s3.Sim3(si_R, si_t, si_s)
            Sj_ = s3.Sim3(sj_R, sj_t, sj_s)
            Sm_ = s3.Sim3(m_R, m_t, m_s)
            f = lambda xi_i, xi_j: _edge_residual(xi_i, xi_j, Si_, Sj_, Sm_)
            e = f(zero7, zero7)
            Ji = jax.jacfwd(f, argnums=0)(zero7, zero7)
            Jj = jax.jacfwd(f, argnums=1)(zero7, zero7)
            return e, Ji, Jj

        return jax.vmap(one)(
            Si.R, Si.t, Si.s, Sj.R, Sj.t, Sj.s, Sm.R, Sm.t, Sm.s
        )

    def cost(R, t, s):
        e, _, _ = residuals_and_jacs(R, t, s)
        return jnp.sum(jnp.where(prob.e_valid[:, None], e * e, 0.0))

    def apply_update(R, t, s, dx):
        dx = dx.reshape(K, 7)
        dx = jnp.where(prob.fixed[:, None], 0.0, dx)
        P = s3.sim3_exp(dx)
        S = s3.Sim3(R, t, s)
        new = P.compose(S)
        return new.R, new.t, new.s

    def iteration(it, carry):
        R, t, s, lam, ni, chi = carry
        e, Ji, Jj = residuals_and_jacs(R, t, s)
        w = prob.e_valid.astype(jnp.float32)
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]
        H = jnp.zeros((K, 7, K, 7))
        H = H.at[prob.e_i, :, prob.e_i, :].add(
            jnp.einsum("eri,erj->eij", Jiw, Ji)
        )
        H = H.at[prob.e_j, :, prob.e_j, :].add(
            jnp.einsum("eri,erj->eij", Jjw, Jj)
        )
        H = H.at[prob.e_i, :, prob.e_j, :].add(
            jnp.einsum("eri,erj->eij", Jiw, Jj)
        )
        H = H.at[prob.e_j, :, prob.e_i, :].add(
            jnp.einsum("eri,erj->eij", Jjw, Ji)
        )
        g = jnp.zeros((K, 7))
        g = g.at[prob.e_i].add(-jnp.einsum("eri,er->ei", Jiw, e))
        g = g.at[prob.e_j].add(-jnp.einsum("eri,er->ei", Jjw, e))

        Hf = H.reshape(K * 7, K * 7)
        gf = g.reshape(-1)
        fixed7 = jnp.repeat(prob.fixed, 7)
        if fix_scale:
            fixed7 = fixed7 | jnp.tile(jnp.arange(7) == 6, K)
        Hf = jnp.where(fixed7[:, None] | fixed7[None, :], 0.0, Hf)
        gf = jnp.where(fixed7, 0.0, gf)
        lam0 = jnp.where(it == 0, 1e-5 * jnp.max(jnp.abs(jnp.diag(Hf))) + 1e-8,
                         lam)
        ni0 = jnp.where(it == 0, 2.0, ni)

        def trial_cond(tc):
            *_, rho, trials, done = tc
            return (~done) & (rho < 0) & (trials < MAX_TRIALS)

        def trial(tc):
            R_c, t_c, s_c, lam_c, ni_c, chi_c, _, trials, _ = tc
            Hd = Hf + jnp.diag(jnp.where(fixed7, 1.0, lam_c))
            dx = jnp.linalg.solve(Hd, gf)
            R2, t2, s2 = apply_update(R_c, t_c, s_c, dx)
            chi_new = cost(R2, t2, s2)
            scale = jnp.dot(dx, lam_c * dx + gf) + 1e-3
            rho = (chi_c - chi_new) / scale
            good = (rho > 0) & jnp.isfinite(chi_new)
            alpha = 1.0 - (2.0 * rho - 1.0) ** 3
            return (
                jnp.where(good, R2, R_c),
                jnp.where(good, t2, t_c),
                jnp.where(good, s2, s_c),
                jnp.where(good, lam_c * jnp.clip(alpha, 1 / 3, 2 / 3),
                          lam_c * ni_c),
                jnp.where(good, 2.0, ni_c * 2.0),
                jnp.where(good, chi_new, chi_c),
                rho,
                trials + 1,
                good,
            )

        R2, t2, s2, lam2, ni2, chi2, *_ = jax.lax.while_loop(
            trial_cond, trial,
            (R, t, s, lam0, ni0, chi, -1.0, 0, False),
        )
        return (R2, t2, s2, lam2, ni2, chi2)

    chi0 = cost(prob.R, prob.t, prob.s)
    R, t, s, *_ = jax.lax.fori_loop(
        0, n_iters, iteration,
        (prob.R, prob.t, prob.s, 0.0, 2.0, chi0),
    )
    return R, t, s

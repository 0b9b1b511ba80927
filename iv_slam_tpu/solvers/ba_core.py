"""Batched bundle-adjustment core: LM with a Schur-complement reduction.

Replaces g2o's BlockSolver_6_3 + OptimizationAlgorithmLevenberg as used by
Optimizer::LocalBundleAdjustment (Optimizer.cc:505-871). The TPU shape:

  * all observations are one padded edge array (E,) with per-edge kf-slot /
    point-slot indices — no sparse graph structure;
  * per-iteration assembly is segment-sums (H_pp, g_p per point; H_cc, g_c
    per camera) plus one scatter of (6, 3) coupling blocks into a dense
    (P, 6K, 3) tensor U;
  * the Schur reduction  S = H_cc - U^T Hpp^-1 U  collapses to two MXU
    matmuls over the point axis, and the reduced (6K, 6K) system is a dense
    Cholesky solve (K <= ~80 local keyframes);
  * back-substitution for the points is a batched 3x3 solve.

Levenberg semantics follow g2o (additive lambda on every diagonal,
tau = 1e-5 * max diag, accept on rho > 0 with the 1/3..2/3 scaling, reject
with lambda *= ni). Huber deltas are quality-scaled per edge exactly as the
reference's introspection hook does (Optimizer.cc:669-739).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera, se3
from .pose_opt import DELTA_MONO_SQ, DELTA_STEREO_SQ, _huber_rho0, _huber_w

MAX_TRIALS = 10


class BAProblem(NamedTuple):
    kf_pose: jnp.ndarray    # (K, 4, 4) Tcw
    kf_fixed: jnp.ndarray   # (K,) bool
    pt_pos: jnp.ndarray     # (P, 3)
    pt_valid: jnp.ndarray   # (P,) bool
    e_kf: jnp.ndarray       # (E,) int32 slot into kf arrays
    e_pt: jnp.ndarray       # (E,) int32 slot into pt arrays
    e_obs: jnp.ndarray      # (E, 3) [u, v, ur]; ur < 0 => mono
    e_inv_s2: jnp.ndarray   # (E,)
    e_qual: jnp.ndarray     # (E,) quality score scaling the Huber delta
    e_valid: jnp.ndarray    # (E,) bool


class BAResult(NamedTuple):
    kf_pose: jnp.ndarray
    pt_pos: jnp.ndarray
    e_chi2: jnp.ndarray     # final unrobust chi2 per edge
    e_depth_pos: jnp.ndarray  # final positive-depth flag per edge
    e_inlier: jnp.ndarray


def _edge_terms(kf_pose, pt_pos, prob: BAProblem, K: camera.Intrinsics):
    T = kf_pose[prob.e_kf]                      # (E, 4, 4)
    X = pt_pos[prob.e_pt]                       # (E, 3)
    pc = jnp.einsum("eij,ej->ei", T[:, :3, :3], X) + T[:, :3, 3]
    pred = camera.project_stereo(K, pc)
    is_stereo = prob.e_obs[:, 2] >= 0
    e = prob.e_obs - pred
    e = e.at[:, 2].set(jnp.where(is_stereo, e[:, 2], 0.0))
    return e, pc, T, is_stereo


def _chi2(e, inv_s2):
    return inv_s2 * jnp.sum(e * e, axis=-1)


def _inv3x3(M):
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    jnp.linalg.inv lowers to an LU custom-call that costs ~6 ms for the
    (P, 3, 3) batch on TPU and runs once per LM trial — the closed form
    is pure elementwise arithmetic (<1 ms). Callers guard singular
    blocks themselves (dead point slots are replaced by identity)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def _ba_ctx(prob: BAProblem, K: camera.Intrinsics, n_kf_slots: int = 0):
    """Shared tracing context for the LM machinery: returns
    (total_cost, build_and_solve, chi2_th) closures over the problem.
    Factored out of ba_solve so the SEGMENTED solver (ba_segment /
    ba_midpoint / ba_finalize — the async local-BA path drives the same
    iterations as several smaller device programs) traces identical
    math."""
    n_kf = prob.kf_pose.shape[0] if n_kf_slots == 0 else n_kf_slots
    n_pt = prob.pt_pos.shape[0]
    is_stereo = prob.e_obs[:, 2] >= 0
    delta_base_sq = jnp.where(is_stereo, DELTA_STEREO_SQ, DELTA_MONO_SQ)
    delta_sq = delta_base_sq * prob.e_qual * prob.e_qual
    chi2_th = delta_base_sq

    def total_cost(kf_pose, pt_pos, mask, kernel_on):
        e, _, _, _ = _edge_terms(kf_pose, pt_pos, prob, K)
        c2 = _chi2(e, prob.e_inv_s2)
        rob = _huber_rho0(c2, delta_sq, kernel_on)
        return jnp.sum(jnp.where(mask, rob, 0.0))

    n_e = prob.e_obs.shape[0]
    # camera-axis reductions as one-hot MXU matmuls: K <= 64, so the
    # (K, E) one-hot is small and the matmul beats a scatter-based
    # segment reduction on TPU
    oh_kf = (prob.e_kf[None, :] == jnp.arange(n_kf)[:, None]).astype(
        jnp.float32)

    def build_and_solve(kf_pose, pt_pos, mask, lam, kernel_on):
        e, pc, T, _ = _edge_terms(kf_pose, pt_pos, prob, K)
        c2 = _chi2(e, prob.e_inv_s2)
        w = _huber_w(c2, delta_sq, kernel_on) * prob.e_inv_s2
        w = jnp.where(mask, w, 0.0)

        Jp = camera.proj_jacobian_stereo(K, pc)          # (E, 3, 3)
        Jp = Jp.at[:, 2, :].set(
            jnp.where(is_stereo[:, None], Jp[:, 2, :], 0.0)
        )
        # pose block: d e / d xi = Jproj @ [hat(pc) | -I]
        Jc = jnp.concatenate(
            [jnp.einsum("eij,ejk->eik", Jp, se3.hat(pc)), -Jp], axis=-1
        )  # (E, 3, 6)
        fixed_e = prob.kf_fixed[prob.e_kf]
        Jc = jnp.where(fixed_e[:, None, None], 0.0, Jc)
        # point block: d e / d X = -Jproj @ Rcw
        Jx = -jnp.einsum("eij,ejk->eik", Jp, T[:, :3, :3])  # (E, 3, 3)

        # per-camera normal blocks: one-hot matmuls (see oh_kf above)
        Hcc = (oh_kf @ jnp.einsum("eri,e,erj->eij", Jc, w, Jc)
               .reshape(n_e, 36)).reshape(n_kf, 6, 6)
        gc = oh_kf @ (-jnp.einsum("eri,e,er->ei", Jc, w, e))  # (K, 6)
        # per-point normal blocks: P is too large for one-hot — segment
        Hpp = jax.ops.segment_sum(
            jnp.einsum("eri,e,erj->eij", Jx, w, Jx), prob.e_pt, n_pt
        )  # (P, 3, 3)
        gp = jax.ops.segment_sum(
            -jnp.einsum("eri,e,er->ei", Jx, w, e), prob.e_pt, n_pt
        )  # (P, 3)

        max_diag = jnp.maximum(
            jnp.max(jnp.abs(jnp.diagonal(Hcc, axis1=1, axis2=2))),
            jnp.max(jnp.abs(jnp.diagonal(Hpp, axis1=1, axis2=2))),
        )

        # lam-independent pieces hoisted OUT of the trial loop: the
        # coupling tensor U and the block-diagonal embedding only change
        # per LM iteration, not per damping trial
        B = jnp.einsum("eri,e,erj->eij", Jc, w, Jx)  # (E, 6, 3)
        U = jnp.zeros((n_pt, n_kf, 6, 3)).at[prob.e_pt, prob.e_kf].add(B)
        U2 = U.reshape(n_pt, n_kf * 6, 3)
        eye_k = jnp.eye(n_kf)

        def solve(lam_c):
            eye3 = jnp.eye(3)
            Hpp_d = Hpp + lam_c * eye3
            # guard dead point slots (all-zero blocks) against singularity
            dead = jnp.abs(jnp.diagonal(Hpp_d, axis1=1, axis2=2)).sum(-1) < 1e-12
            Hpp_d = jnp.where(dead[:, None, None], eye3, Hpp_d)
            Hpp_inv = _inv3x3(Hpp_d)

            # TU[p, n, b] = sum_a U2[p, n, a] Hinv[p, a, b] — unrolled
            # over the tiny (3, 3) contraction so it lowers to broadcast
            # multiplies on well-tiled (P, 6K) slabs instead of a batched
            # matmul with 3-wide inner dims
            TU = jnp.stack(
                [sum(U2[:, :, a] * Hpp_inv[:, a, b][:, None]
                     for a in range(3)) for b in range(3)],
                axis=-1,
            )                                                  # (P, 6K, 3)
            # S_red = sum_p TU[p] @ U2[p]^T as ONE (6K, 3P)x(3P, 6K)
            # MXU matmul (row index = flattened (p, a))
            TUf = TU.transpose(0, 2, 1).reshape(n_pt * 3, n_kf * 6)
            U2f = U2.transpose(0, 2, 1).reshape(n_pt * 3, n_kf * 6)
            S_red = TUf.T @ U2f                                # (6K, 6K)
            Hcc_d = Hcc + lam_c * jnp.eye(6)
            # block-diagonal Hcc into dense (6K, 6K) — einsum with eye,
            # not a scatter (TPU lowers index scatters to serial loops)
            S = jnp.einsum("kl,kij->kilj", eye_k, Hcc_d).reshape(
                n_kf * 6, n_kf * 6)
            S = S - S_red
            rhs = gc.reshape(-1) - TUf.T @ gp.reshape(-1)

            # fixed cameras: identity rows/cols, zero rhs
            fixed6 = jnp.repeat(prob.kf_fixed, 6)
            S = jnp.where(fixed6[:, None] | fixed6[None, :], 0.0, S)
            S = S + jnp.diag(jnp.where(fixed6, 1.0, 1e-9))
            rhs = jnp.where(fixed6, 0.0, rhs)

            dc = jnp.linalg.solve(S, rhs).reshape(n_kf, 6)
            # back-substitute points: dp = Hpp^-1 (gp - U^T dc)
            Ut_dc = (U2f @ dc.reshape(-1)).reshape(n_pt, 3)
            dp = jnp.einsum("pab,pb->pa", Hpp_inv, gp - Ut_dc)
            dp = jnp.where(prob.pt_valid[:, None], dp, 0.0)
            # Powell's predicted decrease uses the ORIGINAL gradient of
            # every block (g2o computeScale: dx^T (lambda dx + b)), NOT the
            # Schur-reduced rhs — with the reduced gradient the prediction
            # overshoots, rho saturates ~2/3, lambda never decays, and the
            # solver crawls (measured: 15 LM iters left a 0.9 m keyframe
            # error that this formula removes in the same 15)
            scale = (
                jnp.sum(dc.reshape(-1) * (lam_c * dc.reshape(-1)
                                          + gc.reshape(-1)))
                + jnp.sum(dp * (lam_c * dp + gp))
            )
            return dc, dp, scale

        return solve, max_diag

    return total_cost, build_and_solve, chi2_th


def _lm_iterations(total_cost, build_and_solve, prob, kf_pose0, pt_pos0,
                   lam0, ni0, chi0, mask, kernel_on, n_iters, init):
    """n_iters LM iterations from carried state (kf_pose, pt_pos, lam,
    ni, chi). init=True applies the first-iteration lambda seeding
    (1e-5 * max diag, g2o's tau); init=False continues a phase split
    across multiple device programs — fori(0, a) then fori(0, b) with
    the carry threaded through equals fori(0, a + b) exactly."""

    def iteration(it, carry):
        kf_pose, pt_pos, lam, ni, chi = carry
        solve, max_diag = build_and_solve(kf_pose, pt_pos, mask, lam,
                                          kernel_on)
        if init:
            lam_i = jnp.where(it == 0, 1e-5 * max_diag, lam)
            ni_i = jnp.where(it == 0, 2.0, ni)
        else:
            lam_i, ni_i = lam, ni

        def trial_cond(tc):
            *_, rho, trials, done = tc
            return (~done) & (rho < 0) & (trials < MAX_TRIALS)

        def trial(tc):
            kp_c, pp_c, lam_c, ni_c, chi_c, _, trials, _ = tc
            dc, dp, scale = solve(lam_c)
            kp_new = jnp.einsum(
                "kij,kjl->kil", se3.se3_exp(dc), kp_c
            )
            kp_new = jnp.where(
                prob.kf_fixed[:, None, None], kp_c, kp_new
            )
            pp_new = pp_c + dp
            chi_new = total_cost(kp_new, pp_new, mask, kernel_on)
            rho = (chi_c - chi_new) / (scale + 1e-3)
            good = (rho > 0) & jnp.isfinite(chi_new)
            alpha = 1.0 - (2.0 * rho - 1.0) ** 3
            lam_good = lam_c * jnp.clip(alpha, 1.0 / 3.0, 2.0 / 3.0)
            return (
                jnp.where(good, kp_new, kp_c),
                jnp.where(good, pp_new, pp_c),
                jnp.where(good, lam_good, lam_c * ni_c),
                jnp.where(good, 2.0, ni_c * 2.0),
                jnp.where(good, chi_new, chi_c),
                rho,
                trials + 1,
                good,
            )

        kp2, pp2, lam2, ni2, chi2_, *_ = jax.lax.while_loop(
            trial_cond, trial,
            (kf_pose, pt_pos, lam_i, ni_i, chi, -1.0, 0, False),
        )
        return (kp2, pp2, lam2, ni2, chi2_)

    return jax.lax.fori_loop(
        0, n_iters, iteration,
        (kf_pose0, pt_pos0, lam0, ni0, chi0),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_iters1", "n_iters2", "n_kf_slots", "kernel2",
                     "midpoint_gate"),
)
def ba_solve(
    prob: BAProblem,
    K: camera.Intrinsics,
    n_iters1: int = 5,
    n_iters2: int = 10,
    n_kf_slots: int = 0,
    kernel2: bool = False,
    midpoint_gate: bool = True,
) -> BAResult:
    """kernel2/midpoint_gate mirror the reference's two BA flavors:
    LocalBundleAdjustment gates outliers between optimize(5)/optimize(10)
    and REMOVES the robust kernel for the second run (Optimizer.cc:774,
    790); plain BundleAdjustment (global BA) is one robust run with no
    midpoint reclassification (Optimizer.cc:51-249)."""
    total_cost, build_and_solve, chi2_th = _ba_ctx(prob, K, n_kf_slots)
    zero, two = jnp.float32(0.0), jnp.float32(2.0)

    # phase 1: 5 iterations on all valid edges, robust kernel on
    mask1 = prob.e_valid
    chi0 = total_cost(prob.kf_pose, prob.pt_pos, mask1, True)
    kf_pose, pt_pos, *_ = _lm_iterations(
        total_cost, build_and_solve, prob, prob.kf_pose, prob.pt_pos,
        zero, two, chi0, mask1, True, n_iters1, init=True,
    )

    # outlier gate between phases (Optimizer.cc:786-817)
    e, pc, _, _ = _edge_terms(kf_pose, pt_pos, prob, K)
    c2 = _chi2(e, prob.e_inv_s2)
    if midpoint_gate:
        inlier = prob.e_valid & (c2 <= chi2_th) & (pc[:, 2] > 0)
    else:
        inlier = prob.e_valid

    # phase 2: 10 more iterations on the inlier set; the reference strips
    # the robust kernel here (setRobustKernel(0), Optimizer.cc:774,790)
    chi0b = total_cost(kf_pose, pt_pos, inlier, kernel2)
    kf_pose, pt_pos, *_ = _lm_iterations(
        total_cost, build_and_solve, prob, kf_pose, pt_pos,
        zero, two, chi0b, inlier, kernel2, n_iters2, init=True,
    )

    # final classification (Optimizer.cc:820-850)
    e, pc, _, _ = _edge_terms(kf_pose, pt_pos, prob, K)
    c2 = _chi2(e, prob.e_inv_s2)
    depth_pos = pc[:, 2] > 0
    final_inlier = prob.e_valid & (c2 <= chi2_th) & depth_pos
    return BAResult(
        kf_pose=kf_pose,
        pt_pos=pt_pos,
        e_chi2=c2,
        e_depth_pos=depth_pos,
        e_inlier=final_inlier,
    )


# --------------------------------------------------------------------------
# Segmented solver: the SAME LM iterations as ba_solve, split into several
# smaller device programs with the (kf_pose, pt_pos, lam, ni, chi) carry
# threaded through on device. The async local-BA path (slam/local_mapping
# worker) drives these with a host sync between segments so the ~150 ms
# rung-2 monolith stops holding the chip while the tracking thread's
# 15-35 ms chained steps queue behind it (same chunking rationale as the
# worker's fuse/triangulation programs). Exact equivalence with ba_solve is
# pinned by tests/test_ba_variants.py::test_segmented_matches_monolith.
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "n_kf_slots", "kernel_on", "init"),
)
def ba_segment(
    prob: BAProblem, K: camera.Intrinsics,
    kf_pose, pt_pos, lam, ni, chi, mask,
    n_iters: int, n_kf_slots: int = 0,
    kernel_on: bool = True, init: bool = False,
):
    """One LM phase segment. init=True seeds chi/lambda (start of a
    phase); init=False continues from the carried state."""
    total_cost, build_and_solve, _ = _ba_ctx(prob, K, n_kf_slots)
    if init:
        chi = total_cost(kf_pose, pt_pos, mask, kernel_on)
        lam = jnp.float32(0.0)
        ni = jnp.float32(2.0)
    return _lm_iterations(
        total_cost, build_and_solve, prob, kf_pose, pt_pos,
        lam, ni, chi, mask, kernel_on, n_iters, init=init,
    )


@functools.partial(jax.jit, static_argnames=("n_kf_slots",))
def ba_midpoint(prob: BAProblem, K: camera.Intrinsics, kf_pose, pt_pos,
                n_kf_slots: int = 0):
    """The between-phase outlier gate (Optimizer.cc:786-817)."""
    _, _, chi2_th = _ba_ctx(prob, K, n_kf_slots)
    e, pc, _, _ = _edge_terms(kf_pose, pt_pos, prob, K)
    c2 = _chi2(e, prob.e_inv_s2)
    return prob.e_valid & (c2 <= chi2_th) & (pc[:, 2] > 0)


@functools.partial(jax.jit, static_argnames=("n_kf_slots",))
def ba_finalize(prob: BAProblem, K: camera.Intrinsics, kf_pose, pt_pos,
                n_kf_slots: int = 0) -> BAResult:
    """Final classification (Optimizer.cc:820-850)."""
    _, _, chi2_th = _ba_ctx(prob, K, n_kf_slots)
    e, pc, _, _ = _edge_terms(kf_pose, pt_pos, prob, K)
    c2 = _chi2(e, prob.e_inv_s2)
    depth_pos = pc[:, 2] > 0
    final_inlier = prob.e_valid & (c2 <= chi2_th) & depth_pos
    return BAResult(
        kf_pose=kf_pose,
        pt_pos=pt_pos,
        e_chi2=c2,
        e_depth_pos=depth_pos,
        e_inlier=final_inlier,
    )

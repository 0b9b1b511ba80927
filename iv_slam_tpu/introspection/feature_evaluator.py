"""Supervised feature scoring: uncertainty-normalized epipolar error.

The heart of IV-SLAM's training-data generation
(src/feature_evaluator.cpp:1341-1512, 2754-2830): each matched keypoint
pair (reference-keyframe observation, current-frame observation) is scored
by the current keypoint's pixel distance to its epipolar line — computed
from ground-truth relative pose — normalized by a first-order propagation
of pose + keypoint-scale uncertainty through the epipolar geometry.

The reference iterates keypoints one at a time with Eigen; here the whole
frame's pairs are one batched jit computation (N x small-matrix algebra —
VPU work that fuses into a handful of kernels).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

MIN_BASELINE = 0.03                  # kMinBaseLine (meters)
MIN_SENSITIVITY = 1.0                # kMinEpipolarErrSensitivity_
NO_COV_NORMALIZATION = 4.0           # kNormalizationFactor (no-cov case)
SCALE95 = 2.4477  # sqrt(5.991)
BAD_ERR_THRESH = 1.0                 # kBadFeatureErrThresh_Epipolar_
BAD_ERR_THRESH_REPROJ = 5.0          # kBadFeatureErrThresh_Reproj_ (.h:331)

# TrainingMode enum (feature_evaluator.h:68-78) -> (reference source,
# error type). The reference LOG(FATAL)s on the two *_last_kf modes
# (fe.cpp:2151-2160, 2206-2209); they raise NotImplementedError here.
TRAINING_MODES = {
    "prev_frame": ("prev", "reproj"),
    "prev_frame_and_last_kf": None,                 # kCompareAgainstPrevFrameAndLastKeyFrame
    "prev_frame_and_ref_kf": ("prev_and_ref", "reproj"),
    "last_kf": None,                                # kCompareAgainstLastKeyFrame
    "ref_kf": ("ref", "reproj"),
    "prev_frame_epipolar": ("prev", "epipolar"),
    "ref_kf_epipolar": ("ref", "epipolar"),
    "prev_frame_epipolar_normalized": ("prev", "epipolar_normalized"),
    "ref_kf_epipolar_normalized": ("ref", "epipolar_normalized"),
}
MIN_BAD_PERCENT = 5.0                # kMinBadMatchPercent_
MAX_BAD_PERCENT = 60.0               # kMaxBadMatchPercent_
MIN_MATCHES = 10                     # kMinMatchesInFrame_


class EpipolarScores(NamedTuple):
    norm_err: jnp.ndarray   # (N,) normalized epipolar error; -1 = invalid
    raw_err: jnp.ndarray    # (N,) pixel distance to the epipolar line
    variance: jnp.ndarray   # (N,) propagated error variance
    foot: jnp.ndarray       # (N, 2) perpendicular foot on the epipolar
                            # line (epipolar_projections_, fe.cpp:2785-2815
                            # — used by DrawEpipolarErrVec)


def _hat(v):
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


@functools.partial(jax.jit, static_argnames=())
def epipolar_scores(
    kp_ref: jnp.ndarray,      # (N, 2) keypoints in the reference frame
    kp_cur: jnp.ndarray,      # (N, 2) matched keypoints in the current frame
    level_sigma2: jnp.ndarray,  # (N,) keypoint scale variance (curr octave)
    valid: jnp.ndarray,       # (N,) bool
    T_rel: jnp.ndarray,       # (4, 4) or (N, 4, 4) ref-cam -> curr-cam GT
                              # transform — PER KEYPOINT when batched (the
                              # reference recomputes it per map point from
                              # that point's OWN reference keyframe,
                              # fe.cpp:2545-2560; one shared transform is
                              # only correct when every scored point has
                              # the same reference keyframe)
    Kmat: jnp.ndarray,        # (3, 3) intrinsics
    sigma_w: jnp.ndarray,     # (3, 3) rotational covariance of T_rel
    sigma_t: jnp.ndarray,     # (3, 3) translational covariance of T_rel
    has_cov: jnp.ndarray,     # () bool — scalar flag
) -> EpipolarScores:
    n = kp_ref.shape[0]
    if T_rel.ndim == 2:
        T_rel = jnp.broadcast_to(T_rel, (n, 4, 4))
    R = T_rel[:, :3, :3]                             # (N, 3, 3)
    t = T_rel[:, :3, 3]                              # (N, 3)
    fx, fy = Kmat[0, 0], Kmat[1, 1]
    cx, cy = Kmat[0, 2], Kmat[1, 2]
    baseline_ok = jnp.linalg.norm(t, axis=-1) >= MIN_BASELINE

    # --- raw epipolar error (CalculateEpipolarErrorVec, fe.cpp:2754-2830) --
    # normalized ref points: K^-1 [u, v, 1]
    ones = jnp.ones(kp_ref.shape[0])
    xr = jnp.stack(
        [(kp_ref[:, 0] - cx) / fx, (kp_ref[:, 1] - cy) / fy, ones], axis=-1
    )
    # The reference projects the keypoint onto the pixel-space epipolar
    # line through the epipole (fe.cpp:2785-2815); that parameterization
    # divides by t_z and degenerates when the motion is parallel to the
    # image plane (epipole at infinity). The point-to-line distance
    # |x_cur^T l| / ||l_12|| with l = [K t]x (K R K^-1) x_ref is the same
    # quantity wherever the epipole is finite and stays defined when it
    # is not — computed below from the Jacobian intermediates.

    # --- analytic variance propagation (GetEpipolarErrorJacobians) --------
    # epipolar line l = F p_ref with F = [K t]_x (K R K^-1) and p_ref the
    # PIXEL homogeneous coordinate (fe.cpp:1849-1866 normalizes by z, not
    # by K). Since K^-1 p_ref = xr, B = K R K^-1 p_ref = K R xr.
    B = (Kmat[None] @ R) @ xr[..., None]             # (N, 3, 1)
    KT = t @ Kmat.T                                  # (N, 3) = K t per point
    l = (_hat(KT) @ B)[..., 0]                       # (N, 3)
    Ln = jnp.maximum(jnp.linalg.norm(l[:, :2], axis=-1), 1e-12)
    L3 = Ln ** 3

    # Jl_t: column i = K[:, i] x B  (GetEpipolarLineJacobians)
    Jl_t = jnp.stack(
        [jnp.cross(Kmat[:, i][None, :], B[..., 0]) for i in range(3)], axis=-1
    )  # (N, 3, 3)
    C = R @ xr[..., None]
    Jl_w = -(_hat(KT) @ (Kmat[None] @ _hat(C[..., 0])))  # (N, 3, 3)

    xn = jnp.concatenate([kp_cur, jnp.ones((kp_cur.shape[0], 1))], axis=-1)
    xl = jnp.sum(xn * l, axis=-1)                    # x^T l
    raw_err = jnp.abs(xl) / Ln                       # distance to epipolar line

    def err_jac(Jl):
        term1 = jnp.einsum("ni,nij->nj", xn, Jl) / Ln[:, None]
        term2 = (
            xl[:, None]
            * (l[:, 0:1] * Jl[:, 0, :] + l[:, 1:2] * Jl[:, 1, :])
            / L3[:, None]
        )
        return term1 - term2  # (N, 3)

    J_t = err_jac(Jl_t)
    J_w = err_jac(Jl_w)
    var_w = jnp.einsum("ni,ij,nj->n", J_w, sigma_w, J_w)
    var_t = jnp.einsum("ni,ij,nj->n", J_t, sigma_t, J_t)
    var = var_w + var_t + level_sigma2

    norm = SCALE95 * jnp.sqrt(jnp.maximum(var, 0.0))
    norm = jnp.where(has_cov, norm, norm * NO_COV_NORMALIZATION)
    norm = jnp.maximum(norm, MIN_SENSITIVITY)

    ok = valid & baseline_ok
    norm_err = jnp.where(ok, raw_err / norm, -1.0)
    # perpendicular foot of the current keypoint on the epipolar line:
    # p - (x^T l)/(lx^2+ly^2) * (lx, ly)
    Ln2 = jnp.maximum(l[:, 0] ** 2 + l[:, 1] ** 2, 1e-12)
    foot = kp_cur - (xl / Ln2)[:, None] * l[:, :2]
    return EpipolarScores(
        norm_err=norm_err,
        raw_err=jnp.where(ok, raw_err, -1.0),
        variance=jnp.where(ok, var, -1.0),
        foot=foot,
    )


def relative_transform(Twc_cur: jnp.ndarray, Twc_ref: jnp.ndarray) -> jnp.ndarray:
    """ref-camera -> current-camera transform from GT camera-to-world poses
    (CalculateRelativeTransform, fe.cpp:3214-3217)."""
    R = Twc_cur[:3, :3]
    t = Twc_cur[:3, 3]
    Tcw = jnp.zeros((4, 4), Twc_cur.dtype)
    Tcw = Tcw.at[:3, :3].set(R.T)
    Tcw = Tcw.at[:3, 3].set(-R.T @ t)
    Tcw = Tcw.at[3, 3].set(1.0)
    return Tcw @ Twc_ref


def gt_reprojection_errors(
    kp_ref: jnp.ndarray,       # (N, 2) reference-frame keypoints
    kp_cur: jnp.ndarray,       # (N, 2) matched current-frame keypoints
    gt_depth_ref: jnp.ndarray,  # (N,) GT depth at the reference keypoints
    valid: jnp.ndarray,
    T_rel: jnp.ndarray,        # (4, 4) ref-cam -> cur-cam GT transform
    Kmat: jnp.ndarray,
) -> jnp.ndarray:
    """Reprojection-based scoring (ErrorType::kReprojection;
    FeatureEvaluator::GetGTReprojection, fe.cpp:1186-1340): backproject the
    reference keypoint with its ground-truth depth, transform with the GT
    relative pose, and measure the pixel distance to the matched current
    keypoint. -1 where invalid (no GT depth)."""
    fx, fy = Kmat[0, 0], Kmat[1, 1]
    cx, cy = Kmat[0, 2], Kmat[1, 2]
    z = gt_depth_ref
    x = (kp_ref[:, 0] - cx) * z / fx
    y = (kp_ref[:, 1] - cy) * z / fy
    p_ref = jnp.stack([x, y, z], axis=-1)
    p_cur = p_ref @ T_rel[:3, :3].T + T_rel[:3, 3]
    zc = p_cur[:, 2]
    u = fx * p_cur[:, 0] / jnp.where(zc != 0, zc, 1.0) + cx
    v = fy * p_cur[:, 1] / jnp.where(zc != 0, zc, 1.0) + cy
    err = jnp.sqrt((u - kp_cur[:, 0]) ** 2 + (v - kp_cur[:, 1]) ** 2)
    ok = valid & (z > 0) & (zc > 0)
    return jnp.where(ok, err, -1.0)


def map_point_reprojection_errors(
    kp_cur: jnp.ndarray,     # (N, 2) current-frame keypoints
    pt_world: jnp.ndarray,   # (N, 3) matched map-point world positions
    T_ref_cw: jnp.ndarray,   # (N, 4, 4) reference frame ESTIMATED Tcw
    T_rel_gt: jnp.ndarray,   # (N, 4, 4) GT ref-cam -> cur-cam transform
    valid: jnp.ndarray,
    Kmat: jnp.ndarray,
) -> jnp.ndarray:
    """Reprojection scoring of the non-epipolar training modes
    (CalculateReprojectionError, fe.cpp:2979-3074): the map point's
    "ground-truth" location in the current camera is its estimated
    position in the reference camera carried over by the GT relative
    transform — X_cur = T_gt(ref->cur) . Tcw_ref . X_w — and the error is
    the pixel distance between its projection and the observed keypoint.
    -1 where invalid. Also returns the (N, 2) projections (reproj2_select_,
    consumed by DrawReprojectionErrVec fe.cpp:816-848)."""
    fx, fy = Kmat[0, 0], Kmat[1, 1]
    cx, cy = Kmat[0, 2], Kmat[1, 2]
    ph = jnp.concatenate([pt_world, jnp.ones_like(pt_world[:, :1])], axis=-1)
    p_ref = jnp.einsum("nij,nj->ni", T_ref_cw, ph)
    p_cur = jnp.einsum("nij,nj->ni", T_rel_gt, p_ref)[:, :3]
    zc = p_cur[:, 2]
    u = fx * p_cur[:, 0] / jnp.where(zc != 0, zc, 1.0) + cx
    v = fy * p_cur[:, 1] / jnp.where(zc != 0, zc, 1.0) + cy
    err = jnp.sqrt((u - kp_cur[:, 0]) ** 2 + (v - kp_cur[:, 1]) ** 2)
    proj = jnp.stack([u, v], axis=-1)
    return jnp.where(valid & (zc != 0), err, -1.0), proj


def rel_pose_cov_from_uncertainty(
    unc: "np.ndarray", ref_id: int, cur_id: int
):
    """Per-frame-pair pose covariance from a loaded uncertainty table
    (GetRelativePoseUncertainty, fe.cpp:2008-2063): take the max
    translational / rotational uncertainty over the frame range, scale by
    1/4.0 and 1/0.1, and build isotropic covariances from the 95% bounds.
    unc: (N, 2) rows of (translational_unc, rotational_unc).
    Returns (sigma_w (3,3), sigma_t (3,3)) or None if out of range."""
    import numpy as np

    lo, hi = min(ref_id, cur_id), max(ref_id, cur_id)
    if lo < 0 or hi >= len(unc):
        return None
    seg = np.asarray(unc[lo:hi + 1], np.float64)
    max_trans = float(seg[:, 0].max()) / 4.0    # tran_unc_scalar
    max_rot = float(seg[:, 1].max()) / 0.1      # rot_unc_scalar
    s_t = (max_trans / SCALE95) ** 2
    s_w = (max_rot / (SCALE95 * np.sqrt(3.0))) ** 2
    return s_w * np.eye(3), s_t * np.eye(3)


def bad_match_stats(norm_err: jnp.ndarray, thresh: float = BAD_ERR_THRESH):
    """Fraction of scored matches above kBadFeatureErrThresh (fe.cpp:82-248)
    -> (bad_percent, n_scored). thresh: 1.0 for epipolar error types,
    5.0 for reprojection (kBadFeatureErrThresh_{Epipolar,Reproj}_,
    feature_evaluator.h:322,331)."""
    scored = norm_err >= 0
    n = jnp.sum(scored.astype(jnp.int32))
    bad = jnp.sum((scored & (norm_err > thresh)).astype(jnp.int32))
    pct = 100.0 * bad / jnp.maximum(n, 1)
    return pct, n


def frame_good_for_training(bad_percent: float, n_scored: int) -> bool:
    """IsFrameGoodForTraining (fe.cpp:1978-1994), Unknown-reliability path."""
    return (
        MIN_BAD_PERCENT < bad_percent < MAX_BAD_PERCENT
        and n_scored > MIN_MATCHES
    )

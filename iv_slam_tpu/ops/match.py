"""Projection-window descriptor matching (ORBmatcher.cc SearchByProjection).

The reference walks a 64x48 acceleration grid per query point
(Frame::GetFeaturesInArea). On TPU the whole matcher is a masked dense
problem: an (nQuery, nKeypoint) Hamming matrix from the MXU (hamming.py)
with window / octave / stereo-consistency masks applied before an argmin.
At ORB scale (2k x 2k) the dense matrix is microseconds — cheaper than any
sparse gather structure, and it vmaps over frames.

Variants implemented:
  * search_by_projection_last_frame — frame-to-frame motion-model tracking
    (ORBmatcher.cc:1372-1520), with forward/backward octave gating and the
    30-bin rotation-consistency histogram
  * search_by_projection_local_map — local-map tracking
    (ORBmatcher.cc:178-270 semantics): frustum-filtered map points, viewing-
    cos radius, best/second-best ratio test within predicted scale band

Deviation: the reference resolves duplicate claims on one keypoint
first-come-first-served in last-frame index order; we keep the lowest
Hamming distance (order-independent, at least as accurate).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from .hamming import hamming_matrix

TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30


def resolve_one_to_one(best_j, best_d, ok, m):
    """Scatter-free one-to-one assignment resolution.

    Each of n claimants proposes target best_j with distance best_d (valid
    when ok); per target keep the lowest-distance claimant, ties broken by
    lowest claimant index — exactly the reference matchers' overwrite
    semantics. XLA:TPU lowers non-unique-index scatter-min to a serial
    per-element loop (milliseconds for thousands of rows); the dense
    (n, m) masked reductions here are three vectorized passes instead.

    Returns (assign (m,) int32 claimant-or--1, wins (n,) bool)."""
    n = best_j.shape[0]
    big = jnp.int32(1 << 20)
    n_idx = jnp.arange(n, dtype=jnp.int32)
    W = best_j[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
    d_claim = jnp.where(ok, best_d.astype(jnp.int32), big)
    best_for = jnp.min(jnp.where(W, d_claim[:, None], big), axis=0)
    wins = ok & (d_claim == best_for[best_j])
    INF = jnp.int32(1 << 30)
    first = jnp.min(
        jnp.where(W & wins[:, None], n_idx[:, None], INF), axis=0
    )
    wins = wins & (first[best_j] == n_idx)
    assign = jnp.max(
        jnp.where(W & wins[:, None], n_idx[:, None], -1), axis=0
    )
    return assign, wins


def rotation_consistency_mask(
    angle_query: jnp.ndarray, angle_matched: jnp.ndarray, matched: jnp.ndarray
) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 dominant
    30-bin histogram bins (ORBmatcher::ComputeThreeMaxima)."""
    rot = angle_query - angle_matched
    rot = jnp.where(rot < 0.0, rot + 360.0, rot)
    bin_idx = jnp.round(rot * (HISTO_LENGTH / 360.0)).astype(jnp.int32)
    bin_idx = jnp.where(bin_idx == HISTO_LENGTH, 0, bin_idx)
    # one-hot reduction, not scatter-add (serial on TPU)
    counts = jnp.sum(
        (
            (bin_idx[:, None] == jnp.arange(HISTO_LENGTH)[None, :])
            & matched[:, None]
        ).astype(jnp.int32),
        axis=0,
    )
    top3 = jax.lax.top_k(counts, 3)
    c1, c2, c3 = top3[0][0], top3[0][1], top3[0][2]
    i1, i2, i3 = top3[1][0], top3[1][1], top3[1][2]
    keep2 = c2.astype(jnp.float32) >= 0.1 * c1.astype(jnp.float32)
    keep3 = c3.astype(jnp.float32) >= 0.1 * c1.astype(jnp.float32)
    ok = (
        (bin_idx == i1)
        | ((bin_idx == i2) & keep2)
        | ((bin_idx == i3) & keep3)
    )
    return matched & ok


@functools.partial(jax.jit, static_argnames=("check_orientation",))
def search_by_projection_last_frame(
    # current frame keypoints
    cur_xy: jnp.ndarray,       # (M, 2)
    cur_octave: jnp.ndarray,   # (M,)
    cur_angle: jnp.ndarray,    # (M,)
    cur_desc: jnp.ndarray,     # (M, 32)
    cur_ur: jnp.ndarray,       # (M,) u_right (-1 mono)
    cur_valid: jnp.ndarray,    # (M,)
    # last-frame tracked map points
    pt_world: jnp.ndarray,     # (N, 3)
    pt_desc: jnp.ndarray,      # (N, 32) map-point distinctive descriptors
    pt_octave: jnp.ndarray,    # (N,) octave of the last-frame observation
    pt_angle: jnp.ndarray,     # (N,) angle of the last-frame keypoint
    pt_valid: jnp.ndarray,     # (N,)
    # geometry
    T_cw: jnp.ndarray,         # (4, 4) current pose
    T_lw: jnp.ndarray,         # (4, 4) last pose
    fx, fy, cx, cy, bf, b,     # scalars
    img_w, img_h,
    scale_factors: jnp.ndarray,
    th: jnp.ndarray,           # search window base (scalar)
    check_orientation: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (assign, n_matches): assign[j] = index into pt arrays for
    current keypoint j, or -1."""
    pc = se3.transform_points(T_cw, pt_world)  # (N, 3)
    z = pc[:, 2]
    invz = 1.0 / jnp.where(z != 0, z, 1.0)
    u = fx * pc[:, 0] * invz + cx
    v = fy * pc[:, 1] * invz + cy
    in_img = (z > 0) & (u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)
    proj_ok = pt_valid & in_img

    # forward/backward translation along optical axis (ORBmatcher.cc:1387-1393)
    twc = se3.inverse(T_cw)[:3, 3]
    tlc = T_lw[:3, :3] @ twc + T_lw[:3, 3]
    forward = tlc[2] > b
    backward = -tlc[2] > b

    radius = th * scale_factors[pt_octave]  # (N,)
    du = jnp.abs(cur_xy[:, 0][None, :] - u[:, None])  # (N, M)
    dv = jnp.abs(cur_xy[:, 1][None, :] - v[:, None])
    in_window = (du < radius[:, None]) & (dv < radius[:, None])

    co = cur_octave[None, :]
    po = pt_octave[:, None]
    oct_fwd = co >= po
    oct_bwd = co <= po
    oct_near = jnp.abs(co - po) <= 1
    oct_ok = jnp.where(forward, oct_fwd, jnp.where(backward, oct_bwd, oct_near))

    # stereo right-coordinate consistency
    ur_pred = u[:, None] - bf * invz[:, None]
    stereo_ok = jnp.where(
        cur_ur[None, :] > 0,
        jnp.abs(ur_pred - cur_ur[None, :]) <= radius[:, None],
        True,
    )

    mask = (
        proj_ok[:, None] & cur_valid[None, :] & in_window & oct_ok & stereo_ok
    )
    dist = hamming_matrix(pt_desc, cur_desc)  # (N, M)
    big = jnp.int32(1 << 20)
    masked = jnp.where(mask, dist, big)
    best_j = jnp.argmin(masked, axis=1)              # per map point
    best_d = jnp.take_along_axis(masked, best_j[:, None], axis=1)[:, 0]
    point_matched = best_d <= TH_HIGH

    # resolve conflicts: keep lowest distance per current keypoint
    assign, _wins = resolve_one_to_one(
        best_j, best_d, point_matched, cur_xy.shape[0]
    )
    matched_kp = assign >= 0

    if check_orientation:
        safe_assign = jnp.maximum(assign, 0)
        matched_kp = rotation_consistency_mask(
            pt_angle[safe_assign], cur_angle, matched_kp
        )
        assign = jnp.where(matched_kp, assign, -1)
    return assign, jnp.sum(matched_kp.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("check_orientation",))
def search_for_initialization(
    xy1: jnp.ndarray,      # (N, 2) frame-1 keypoints
    oct1: jnp.ndarray,
    angle1: jnp.ndarray,
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    xy2: jnp.ndarray,      # (M, 2) frame-2 keypoints
    oct2: jnp.ndarray,
    angle2: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    prev_xy: jnp.ndarray,  # (N, 2) predicted positions in frame 2
    window: jnp.ndarray,   # search radius (reference: 100)
    nn_ratio: jnp.ndarray,  # 0.9 in MonocularInitialization
    check_orientation: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ORBmatcher::SearchForInitialization (ORBmatcher.cc:69 semantics):
    level-0-only windowed search with best/second ratio and rotation
    histogram. Returns (assign (N,), n): frame-2 index per frame-1 kp."""
    du = jnp.abs(xy2[None, :, 0] - prev_xy[:, None, 0])
    dv = jnp.abs(xy2[None, :, 1] - prev_xy[:, None, 1])
    mask = (
        (du < window) & (dv < window)
        & (oct1[:, None] == 0) & (oct2[None, :] == 0)
        & valid1[:, None] & valid2[None, :]
    )
    dist = hamming_matrix(desc1, desc2)
    big = jnp.int32(1 << 20)
    masked = jnp.where(mask, dist, big)
    top2_v, top2_i = jax.lax.top_k(-masked, 2)
    best_d = -top2_v[:, 0]
    best_j = top2_i[:, 0]
    second_d = -top2_v[:, 1]
    ok = (best_d <= TH_LOW) & (
        best_d.astype(jnp.float32) < nn_ratio * second_d.astype(jnp.float32)
    )
    # one-to-one resolution by lowest distance
    _t_assign, wins = resolve_one_to_one(best_j, best_d, ok, xy2.shape[0])
    assign = jnp.where(wins, best_j, -1)
    if check_orientation:
        safe = jnp.maximum(assign, 0)
        keep = rotation_consistency_mask(angle1, angle2[safe], assign >= 0)
        assign = jnp.where(keep, assign, -1)
    return assign, jnp.sum((assign >= 0).astype(jnp.int32))


def _radius_by_viewing_cos(cos_v: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(cos_v > 0.998, 2.5, 4.0)


def frustum_gate(
    pt_world, pt_normal, pt_min_dist, pt_max_dist, pt_valid,
    T_cw, fx, fy, cx, cy, img_w, img_h,
):
    """Frame::isInFrustum as a (P,) mask — the exact per-point gate
    search_by_projection_local_map applies before its pair matrix
    (projection in-image + scale-invariance distance band + viewing
    angle < 60 deg). Factored out so the fused tracking step can COMPACT
    the live map table to the gated survivors before paying the (P, N)
    Hamming/window work: at the 16k live rung only ~1-3k points survive
    a forward-motion frustum, so compaction cuts the matcher's dominant
    cost ~4x with identical results (the matcher re-applies the same
    gate on the compacted rows)."""
    pc = se3.transform_points(T_cw, pt_world)
    z = pc[:, 2]
    invz = 1.0 / jnp.where(z != 0, z, 1.0)
    u = fx * pc[:, 0] * invz + cx
    v = fy * pc[:, 1] * invz + cy
    in_img = (z > 0) & (u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)
    cam_center = se3.inverse(T_cw)[:3, 3]
    po_vec = pt_world - cam_center[None, :]
    dist = jnp.linalg.norm(po_vec, axis=-1)
    dist_ok = (dist >= 0.8 * pt_min_dist) & (dist <= 1.2 * pt_max_dist)
    view_cos = jnp.sum(po_vec * pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    return pt_valid & in_img & dist_ok & (view_cos >= 0.5)


@functools.partial(jax.jit, static_argnames=())
def search_by_projection_local_map(
    cur_xy: jnp.ndarray,
    cur_octave: jnp.ndarray,
    cur_desc: jnp.ndarray,
    cur_ur: jnp.ndarray,
    cur_valid: jnp.ndarray,
    cur_has_point: jnp.ndarray,   # (M,) bool: keypoint already matched
    # candidate local map points (pre-filtered by frustum on host or device)
    pt_world: jnp.ndarray,        # (N, 3)
    pt_desc: jnp.ndarray,
    pt_normal: jnp.ndarray,       # (N, 3) mean viewing direction
    pt_min_dist: jnp.ndarray,     # (N,) scale-invariance range
    pt_max_dist: jnp.ndarray,
    pt_valid: jnp.ndarray,
    T_cw: jnp.ndarray,
    fx, fy, cx, cy, bf,
    img_w, img_h,
    scale_factors: jnp.ndarray,   # (L,)
    log_scale: jnp.ndarray,       # scalar log(scaleFactor)
    th: jnp.ndarray,
    nn_ratio: jnp.ndarray,        # mfNNratio (0.8 in TrackLocalMap)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SearchLocalPoints core: frustum check + windowed best/second-best
    matching (Frame::isInFrustum + ORBmatcher::SearchByProjection(Frame&,
    vector<MapPoint*>&, th)). Returns (assign, n_matches)."""
    n_levels = scale_factors.shape[0]
    pc = se3.transform_points(T_cw, pt_world)
    z = pc[:, 2]
    invz = 1.0 / jnp.where(z != 0, z, 1.0)
    u = fx * pc[:, 0] * invz + cx
    v = fy * pc[:, 1] * invz + cy
    in_img = (z > 0) & (u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)

    # distance within scale pyramid range + viewing angle < 60 deg
    # Frame::isInFrustum: dist in [0.8 * minDist, 1.2 * maxDist], viewing
    # angle < 60 deg
    cam_center = se3.inverse(T_cw)[:3, 3]
    po_vec = pt_world - cam_center[None, :]
    dist = jnp.linalg.norm(po_vec, axis=-1)
    dist_ok = (dist >= 0.8 * pt_min_dist) & (dist <= 1.2 * pt_max_dist)
    view_cos = jnp.sum(po_vec * pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    view_ok = view_cos >= 0.5
    in_frustum = pt_valid & in_img & dist_ok & view_ok

    # MapPoint::PredictScale: ceil(log(maxDist / dist) / log(scaleFactor))
    pred = jnp.ceil(
        jnp.log(jnp.maximum(pt_max_dist / jnp.maximum(dist, 1e-9), 1e-9))
        / log_scale
    )
    pred = jnp.clip(pred, 0, n_levels - 1).astype(jnp.int32)

    r = _radius_by_viewing_cos(view_cos) * th * scale_factors[pred]
    du = jnp.abs(cur_xy[:, 0][None, :] - u[:, None])
    dv = jnp.abs(cur_xy[:, 1][None, :] - v[:, None])
    in_window = (du < r[:, None]) & (dv < r[:, None])

    co = cur_octave[None, :]
    oct_ok = (co >= pred[:, None] - 1) & (co <= pred[:, None] + 1)

    ur_pred = u[:, None] - bf * invz[:, None]
    stereo_ok = jnp.where(
        cur_ur[None, :] > 0,
        jnp.abs(ur_pred - cur_ur[None, :]) <= r[:, None],
        True,
    )

    mask = (
        in_frustum[:, None]
        & cur_valid[None, :]
        & (~cur_has_point)[None, :]
        & in_window
        & oct_ok
        & stereo_ok
    )
    dist_m = hamming_matrix(pt_desc, cur_desc)
    big = jnp.int32(1 << 20)
    masked = jnp.where(mask, dist_m, big)

    # best + second best (at a different octave — reference rejects only when
    # bestLevel == bestLevel2 and ratio fails)
    neg = -masked
    top2_v, top2_i = jax.lax.top_k(neg, 2)
    best_d = -top2_v[:, 0]
    best_j = top2_i[:, 0]
    second_d = -top2_v[:, 1]
    second_j = top2_i[:, 1]
    same_level = cur_octave[best_j] == cur_octave[second_j]
    ratio_fail = same_level & (
        best_d.astype(jnp.float32) > nn_ratio * second_d.astype(jnp.float32)
    )
    point_matched = (best_d <= TH_HIGH) & ~ratio_fail

    assign, _wins = resolve_one_to_one(
        best_j, best_d, point_matched, cur_xy.shape[0]
    )
    return assign, jnp.sum((assign >= 0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("scw",))
def fuse_into_keyframes(
    # target keyframes, stacked (NB, ...)
    kf_xy: jnp.ndarray,        # (NB, N, 2)
    kf_oct: jnp.ndarray,       # (NB, N)
    kf_desc: jnp.ndarray,      # (NB, N, 32)
    kf_valid: jnp.ndarray,     # (NB, N)
    kf_ur: jnp.ndarray,        # (NB, N) mvuRight; < 0 = mono keypoint
    kf_T: jnp.ndarray,         # (NB, 4, 4) Tcw
    # candidate map points (P, ...)
    pt_pos: jnp.ndarray, pt_desc: jnp.ndarray, pt_normal: jnp.ndarray,
    pt_mind: jnp.ndarray, pt_maxd: jnp.ndarray,
    pt_mask_nb: jnp.ndarray,   # (NB, P) point eligible for this target
    scale_factors: jnp.ndarray,
    log_scale: jnp.ndarray,
    fx, fy, cx, cy, width, height, bf,
    radius_th: jnp.ndarray,    # 3.0 (ORBmatcher::Fuse th) / 4.0 (Scw)
    scw: bool = False,
) -> jnp.ndarray:
    """ORBmatcher::Fuse batched over target keyframes AND points: the
    whole LocalMapping::SearchInNeighbors projection pass (2-hop fuse,
    LocalMapping.cc:527-607) as ONE program returning the best matching
    feature per (target, point) or -1. The host applies the
    add-observation / MapPoint::Replace bookkeeping from this assignment
    (revalidating liveness, since batch decisions see one snapshot).

    Reference-exact gating (ORBmatcher.cc:831-981):
    * distance gate on the invariance bounds 0.8*minD / 1.2*maxD
      (MapPoint::Get{Min,Max}DistanceInvariance);
    * asymmetric octave window kpLevel in [pred-1, pred] (917);
    * per-CANDIDATE reprojection gate before the Hamming argmin —
      stereo keypoints (mvuRight >= 0) use (ex^2+ey^2+er^2)*invSigma2
      <= 7.8 with er against the point's virtual right coord u - bf/z
      (920-933); mono candidates use (ex^2+ey^2)*invSigma2 <= 5.99.

    ``scw=True`` selects the loop-closing variant
    Fuse(KeyFrame*, cv::Mat Scw, ...) (ORBmatcher.cc:983-1106), which
    differs ONLY by having no reprojection gate at all (candidates in
    the radius+level window compete purely on descriptor distance).
    """
    sf = scale_factors
    inv_sigma2 = 1.0 / (sf * sf)
    n_levels = sf.shape[0]
    big = jnp.int32(1 << 20)

    def one_target(xy, oct_, desc, valid, ur, T, mask_p):
        R, tvec = T[:3, :3], T[:3, 3]
        O = -R.T @ tvec
        pc = pt_pos @ R.T + tvec
        z = pc[:, 2]
        zs = jnp.maximum(z, 1e-9)
        u = fx * pc[:, 0] / zs + cx
        v = fy * pc[:, 1] / zs + cy
        diff = pt_pos - O[None]
        dist = jnp.linalg.norm(diff, axis=1)
        vcos = jnp.sum(diff * pt_normal, axis=1) / jnp.maximum(dist, 1e-9)
        visible = (
            (z > 0)
            & (u >= 0) & (u < width) & (v >= 0) & (v < height)
            & (dist >= 0.8 * pt_mind) & (dist <= 1.2 * pt_maxd)
            & (vcos >= 0.5) & mask_p
        )
        pred = jnp.clip(
            jnp.ceil(
                jnp.log(jnp.maximum(pt_maxd / jnp.maximum(dist, 1e-9), 1e-9))
                / log_scale
            ),
            0, n_levels - 1,
        ).astype(jnp.int32)
        r = radius_th * sf[pred]                      # (P,)
        d_oct = oct_[None, :] - pred[:, None]
        in_win = (
            (jnp.abs(xy[None, :, 0] - u[:, None]) < r[:, None])
            & (jnp.abs(xy[None, :, 1] - v[:, None]) < r[:, None])
            & (d_oct >= -1) & (d_oct <= 0)
            & valid[None, :]
        )                                             # (P, N)
        if not scw:
            ex = xy[None, :, 0] - u[:, None]          # (P, N)
            ey = xy[None, :, 1] - v[:, None]
            e2 = ex * ex + ey * ey
            ur_pt = u - bf / zs                       # point's virtual u_r
            er = ur[None, :] - ur_pt[:, None]
            e2_st = e2 + er * er
            isig = inv_sigma2[oct_][None, :]          # (1, N)
            gate = jnp.where(ur[None, :] >= 0,
                             e2_st * isig <= 7.8,
                             e2 * isig <= 5.99)
            in_win = in_win & gate
        dmat = hamming_matrix(pt_desc, desc)
        masked = jnp.where(in_win & visible[:, None], dmat, big)
        best = jnp.argmin(masked, axis=1)
        bd = jnp.take_along_axis(masked, best[:, None], axis=1)[:, 0]
        ok = bd <= TH_LOW
        return jnp.where(ok, best, -1)

    return jax.vmap(one_target)(
        kf_xy, kf_oct, kf_desc, kf_valid, kf_ur, kf_T, pt_mask_nb
    )


# fused matches per keyframe event are O(1000); the dense (NB, P)
# assignment is 0.25-2 MB of mostly -1 rows per download. KITTI-scale
# events produce 4-6k matches across 64 targets (profiled), so the cap
# sits above that; overflow is warned, never silent.
F_CAP = 8192


@functools.partial(jax.jit, static_argnames=("scw",))
def fuse_into_keyframes_compact(
    kf_xy, kf_oct, kf_desc, kf_valid, kf_ur, kf_T,
    pt_pos, pt_desc, pt_normal, pt_mind, pt_maxd, pt_mask_nb,
    scale_factors, log_scale,
    fx, fy, cx, cy, width, height, bf,
    radius_th,
    scw: bool = False,
) -> jnp.ndarray:
    """fuse_into_keyframes with the matches COMPACTED on device: one
    (F_CAP, 3) table of [target_t, point_i, feature] triples plus the true
    count, in the dense pack's (target-major, point) order — the host
    apply loop sees identical matches in identical order while the
    download shrinks ~20-40x. Returns flat (F_CAP*3 + 1,) float32."""
    assign = fuse_into_keyframes(
        kf_xy, kf_oct, kf_desc, kf_valid, kf_ur, kf_T,
        pt_pos, pt_desc, pt_normal, pt_mind, pt_maxd, pt_mask_nb,
        scale_factors, log_scale,
        fx, fy, cx, cy, width, height, bf, radius_th, scw=scw,
    )                                                # (NB, P)
    nb, p = assign.shape
    f32 = jnp.float32
    flat = assign.reshape(-1)
    good = flat >= 0
    # k-th-set-bit GATHER compaction (cumsum + vectorized binary search)
    # — an .at[].set scatter here lowers to a serial per-row while loop
    # on TPU (profiler-measured; see triangulate_event_compact)
    cum = jnp.cumsum(good.astype(jnp.int32))
    sel = jnp.searchsorted(
        cum, jnp.arange(1, F_CAP + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    sel = jnp.minimum(sel, nb * p - 1)
    slot_ok = jnp.arange(F_CAP) < cum[-1]
    out = jnp.where(
        slot_ok[:, None],
        jnp.stack([(sel // p).astype(f32), (sel % p).astype(f32),
                   flat[sel].astype(f32)], axis=1),
        0.0,
    )
    count = cum[-1]
    return jnp.concatenate([out.reshape(-1), count.astype(f32)[None]])


@functools.partial(jax.jit, static_argnames=("scw",))
def fuse_into_keyframes_compact_indexed(
    kf_xy, kf_oct, kf_desc, kf_valid, kf_ur, kf_T,
    kf_ok,                       # (NB,) bool: real (non-padded) targets
    # FULL-capacity device-map mirror tables (slam/device_map.py
    # full_views): constant shapes -> one compiled program per
    # (NB, P_cap) rung for the whole session
    map_pos, map_desc, map_normal, map_mind, map_maxd, map_valid,
    pid_idx,                     # (P,) int32 rows into the mirror;
                                 # >= capacity = padding
    scale_factors, log_scale,
    fx, fy, cx, cy, width, height, bf,
    radius_th,
    scw: bool = False,
) -> jnp.ndarray:
    """fuse_into_keyframes_compact with the candidate point tables
    GATHERED from the device-resident map mirror by arena row index: the
    keyframe event uploads a (P,) int32 index vector (~8-64 KB) instead
    of re-uploading pos/desc/normal/distance tables (~0.5-1 MB) through
    the link. The caller must have delta-synced the mirror first so
    rows created by this event's triangulation are present. Output
    format and match semantics are identical to
    fuse_into_keyframes_compact (point index i = row i of pid_idx)."""
    cap = map_valid.shape[0]
    ok = pid_idx < cap
    pid = jnp.minimum(pid_idx, cap - 1)
    pt_pos = map_pos[pid]
    pt_desc = map_desc[pid]
    pt_normal = map_normal[pid]
    pt_mind = map_mind[pid]
    pt_maxd = map_maxd[pid]
    pt_ok = ok & map_valid[pid]
    mask_nb = kf_ok[:, None] & pt_ok[None, :]
    return fuse_into_keyframes_compact(
        kf_xy, kf_oct, kf_desc, kf_valid, kf_ur, kf_T,
        pt_pos, pt_desc, pt_normal, pt_mind, pt_maxd, mask_nb,
        scale_factors, log_scale,
        fx, fy, cx, cy, width, height, bf, radius_th, scw=scw,
    )

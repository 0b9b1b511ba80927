"""Epipolar matching + two-view triangulation for new map points
(ORBmatcher::SearchForTriangulation, ORBmatcher.cc:72 + CheckDistEpipolarLine
146; LocalMapping::CreateNewMapPoints, LocalMapping.cc:273-525).

The reference restricts candidate pairs through DBoW2 feature-vector
buckets (a CPU pruning device) and loops per feature. On TPU the full
Hamming matrix is nearly free (MXU), so the bucket pruning is dropped and
replaced by the same geometric gates applied densely: the epipolar-line
distance check, the not-already-matched masks, and the descriptor
threshold. Triangulation checks (parallax, cheirality, reprojection,
scale consistency) run batched over all accepted pairs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .hamming import hamming_matrix

TH_LOW = 50


class TriangulationResult(NamedTuple):
    assign: jnp.ndarray     # (N1,) index into kf2 features or -1
    points: jnp.ndarray     # (N1, 3) world points for accepted matches
    accepted: jnp.ndarray   # (N1,) bool


def fundamental_from_poses(T1w, T2w, K1, K2):
    """F12 such that x2^T F12^T ... reference ComputeF12 (LocalMapping.cc:609):
    F12 = K1^-T [t12]x R12 K2^-1 with T12 = T1w * T2w^-1."""
    R1, t1 = T1w[:3, :3], T1w[:3, 3]
    R2, t2 = T2w[:3, :3], T2w[:3, 3]
    R12 = R1 @ R2.T
    t12 = -(R12 @ t2) + t1
    tx = jnp.array(
        [
            [0.0, -t12[2], t12[1]],
            [t12[2], 0.0, -t12[0]],
            [-t12[1], t12[0], 0.0],
        ]
    )
    return jnp.linalg.inv(K1).T @ tx @ R12 @ jnp.linalg.inv(K2)


@functools.partial(jax.jit, static_argnames=())
def search_for_triangulation(
    xy1: jnp.ndarray, desc1: jnp.ndarray, free1: jnp.ndarray,
    xy2: jnp.ndarray, desc2: jnp.ndarray, free2: jnp.ndarray,
    F12: jnp.ndarray,
    sigma2_2: jnp.ndarray,   # (N2,) level variance of kf2 keypoints
    epipole2: jnp.ndarray,   # (2,) projection of cam1 center in kf2
    ex_check: jnp.ndarray,   # () bool: enforce min distance to epipole (mono)
    sigma2_1_for_ex: jnp.ndarray,  # (N2,) scale^2 for the epipole gate
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (assign (N1,), n). Matches unmatched features of kf1 to kf2
    under the epipolar constraint."""
    dist = hamming_matrix(desc1, desc2)
    # epipolar line of x1 in image 2: l2 = x1^T F12 (ORBmatcher.cc:146)
    ones = jnp.ones((xy1.shape[0], 1))
    x1h = jnp.concatenate([xy1, ones], axis=1)
    l2 = x1h @ F12  # (N1, 3)
    x2h = jnp.concatenate([xy2, jnp.ones((xy2.shape[0], 1))], axis=1)
    num = (l2 @ x2h.T) ** 2  # (N1, N2)
    den = l2[:, 0:1] ** 2 + l2[:, 1:2] ** 2
    dsqr = num / jnp.maximum(den, 1e-12)
    epi_ok = dsqr < 3.84 * sigma2_2[None, :]
    # mono epipole proximity gate (ORBmatcher.cc SearchForTriangulation:
    # skip keypoints too close to the epipole)
    de2 = jnp.sum((xy2 - epipole2[None]) ** 2, axis=1)
    ex_ok = jnp.where(ex_check, de2[None, :] >= 100.0 * sigma2_1_for_ex[None, :],
                      True)
    mask = free1[:, None] & free2[None, :] & epi_ok & ex_ok
    big = jnp.int32(1 << 20)
    masked = jnp.where(mask, dist, big)
    best_j = jnp.argmin(masked, axis=1)
    best_d = jnp.take_along_axis(masked, best_j[:, None], axis=1)[:, 0]
    ok = best_d < TH_LOW
    # one-to-one (scatter-free: ops/match.py resolve_one_to_one)
    from .match import resolve_one_to_one

    _t_assign, wins = resolve_one_to_one(best_j, best_d, ok, xy2.shape[0])
    assign = jnp.where(wins, best_j, -1)
    return assign, jnp.sum(wins.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=())
def search_for_triangulation_batched(
    xy1, desc1, free1,
    xy2_nb, desc2_nb, free2_nb,      # (NB, N2, ...) stacked neighbors
    F12_nb,                          # (NB, 3, 3)
    sigma2_2_nb,                     # (NB, N2)
    epipole2_nb,                     # (NB, 2)
    ex_check_nb,                     # (NB,) bool
    sigma2_1_for_ex_nb,              # (NB, N2)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """search_for_triangulation vmapped over the covisible-neighbor axis:
    the per-keyframe CreateNewMapPoints neighbor loop (LocalMapping.cc:
    295-316) becomes ONE launch returning (NB, N1) assignments."""
    return jax.vmap(
        search_for_triangulation,
        in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, 0),
    )(
        xy1, desc1, free1, xy2_nb, desc2_nb, free2_nb, F12_nb,
        sigma2_2_nb, epipole2_nb, ex_check_nb, sigma2_1_for_ex_nb,
    )


@functools.partial(jax.jit, static_argnames=())
def triangulate_event(
    # current keyframe (N1, ...)
    xy1, desc1, free1, ur1, depth1, sig2_1, scale1,
    # stacked covisible neighbors (NB, N1, ...)
    xy2_nb, desc2_nb, free2_nb, ur2_nb, depth2_nb, sig2_2_nb, scale2_nb,
    F12_nb, epipole2_nb, ex_check_nb,
    T1w, T2w_nb,
    fx, fy, cx, cy, bf,
) -> jnp.ndarray:
    """The WHOLE keyframe triangulation event as one program: the
    neighbor-batched epipolar search feeds straight into triangulation of
    every (neighbor, feature) pair on device — no host compaction between
    the two stages (the reference's per-neighbor loop is
    LocalMapping.cc:295-525). Returns one host-bound (NB, N1, 5) pack
    [assign, good, X_world] so the keyframe event costs a single dispatch
    and a single download."""
    assign, _ = jax.vmap(
        search_for_triangulation,
        in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, 0),
    )(
        xy1, desc1, free1, xy2_nb, desc2_nb, free2_nb, F12_nb,
        sig2_2_nb, epipole2_nb, ex_check_nb, sig2_2_nb,
    )                                               # (NB, N1)
    nb, n1 = assign.shape
    j = jnp.maximum(assign, 0)

    def g(arr):
        return jnp.take_along_axis(arr, j, axis=1).reshape(-1)

    xy2 = jnp.take_along_axis(xy2_nb, j[:, :, None], axis=1).reshape(-1, 2)
    T2_pairs = jnp.broadcast_to(
        T2w_nb[:, None], (nb, n1, 4, 4)
    ).reshape(-1, 4, 4)
    X, good = triangulate_checked(
        jnp.tile(xy1, (nb, 1)), xy2,
        jnp.tile(ur1, nb), jnp.tile(depth1, nb),
        g(ur2_nb), g(depth2_nb),
        jnp.tile(sig2_1, nb), g(sig2_2_nb),
        jnp.tile(scale1, nb), g(scale2_nb),
        (assign >= 0).reshape(-1),
        T1w, T2_pairs, fx, fy, cx, cy, bf,
    )
    return jnp.concatenate(
        [assign.astype(jnp.float32)[:, :, None],
         good.reshape(nb, n1, 1).astype(jnp.float32),
         X.reshape(nb, n1, 3)], axis=-1,
    )


# accepted (neighbor, feature) pairs per event are O(100); the dense
# (NB, N1, 5) pack is ~650 KB of mostly-rejected rows per download
T_CAP = 2048


@functools.partial(jax.jit, static_argnames=())
def triangulate_event_compact(
    xy1, desc1, free1, ur1, depth1, oct1,
    xy2_nb, desc2_nb, free2_nb, ur2_nb, depth2_nb, oct2_nb,
    F12_nb, epipole2_nb, ex_check_nb,
    T1w, T2w_nb, scale_factors,
    fx, fy, cx, cy, bf,
) -> jnp.ndarray:
    """triangulate_event with the accepted pairs COMPACTED on device: the
    host downloads one (T_CAP, 6) table [nb_i, f1, f2, X_world] plus the
    true count instead of the dense (NB, N1, 5) pack — ~25 KB instead of
    ~650 KB per keyframe event through the host link. Rows keep the dense
    pack's (neighbor-major, feature) order, so the host apply loop is
    order-identical. Returns a flat (T_CAP*6 + 2,) float32 vector; the
    tail is [accepted count, raw epipolar-match count] (the caller warns
    on > T_CAP overflow — geometrically implausible at default caps but
    never silent).

    Takes per-keypoint OCTAVES (+ the (L,) scale_factors ladder) and
    derives sigma^2/scale in-program: the octave arrays are already
    device-resident frontend outputs, so the event stops uploading four
    (NB, N1) float tables through the link."""
    sf = scale_factors
    scale1 = sf[oct1]
    sig2_1 = scale1 * scale1
    scale2_nb = sf[oct2_nb]
    sig2_2_nb = scale2_nb * scale2_nb
    assign, _ = jax.vmap(
        search_for_triangulation,
        in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, 0),
    )(
        xy1, desc1, free1, xy2_nb, desc2_nb, free2_nb, F12_nb,
        sig2_2_nb, epipole2_nb, ex_check_nb, sig2_2_nb,
    )                                               # (NB, N1)
    nb, n1 = assign.shape
    f32 = jnp.float32

    # ---- compact the accepted epipolar matches BEFORE triangulation:
    # only O(100) of the NB*N1 pairs match, and the per-pair DLT (a 4x4
    # SVD each) dominates the event's device time when run densely.
    # k-th-set-bit GATHER (cumsum + vectorized binary search), stable in
    # row-major order — NOT an .at[].set scatter: XLA:TPU lowers a
    # non-unique-index scatter to a serial per-row while loop (profiler-
    # measured at ~170 ms for these NB*N1 = 32k rows; the gather form is
    # fully parallel).
    matched = (assign >= 0).reshape(-1)
    cum = jnp.cumsum(matched.astype(jnp.int32))
    sel = jnp.searchsorted(
        cum, jnp.arange(1, T_CAP + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    sel = jnp.minimum(sel, nb * n1 - 1)
    pair_valid = jnp.arange(T_CAP) < cum[-1]
    nbi = (sel // n1).astype(jnp.int32)
    f1 = (sel % n1).astype(jnp.int32)
    f2 = assign[nbi, f1]                            # (T_CAP,)
    j2 = jnp.maximum(f2, 0)

    X, good = triangulate_checked(
        xy1[f1], xy2_nb[nbi, j2],
        ur1[f1], depth1[f1],
        ur2_nb[nbi, j2], depth2_nb[nbi, j2],
        sig2_1[f1], sig2_2_nb[nbi, j2],
        scale1[f1], scale2_nb[nbi, j2],
        pair_valid,
        T1w, T2w_nb[nbi], fx, fy, cx, cy, bf,
    )                                               # (T_CAP, ...)

    # ---- second compaction: keep only pairs that triangulated (same
    # gather form; see above for why not a scatter)
    rows = jnp.stack(
        [nbi.astype(f32), f1.astype(f32), f2.astype(f32),
         X[:, 0], X[:, 1], X[:, 2]], axis=1,
    )                                               # (T_CAP, 6)
    cum2 = jnp.cumsum(good.astype(jnp.int32))
    sel2 = jnp.searchsorted(
        cum2, jnp.arange(1, T_CAP + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    sel2 = jnp.minimum(sel2, T_CAP - 1)
    slot_ok2 = jnp.arange(T_CAP) < cum2[-1]
    out = jnp.where(slot_ok2[:, None], rows[sel2], 0.0)
    # tail: [accepted count, raw epipolar-match count] — the second lets
    # the caller warn when matches overflowed T_CAP before triangulation
    # (never silent)
    n_good = jnp.sum(good.astype(jnp.int32))
    n_matched = jnp.sum(matched.astype(jnp.int32))
    return jnp.concatenate(
        [out.reshape(-1), n_good.astype(f32)[None],
         n_matched.astype(f32)[None]]
    )


@functools.partial(jax.jit, static_argnames=())
def triangulate_checked(
    xy1: jnp.ndarray, xy2: jnp.ndarray,       # (N, 2) matched pixels
    ur1: jnp.ndarray, depth1: jnp.ndarray,    # stereo data of kf1 features
    ur2: jnp.ndarray, depth2: jnp.ndarray,
    sigma2_1: jnp.ndarray, sigma2_2: jnp.ndarray,
    scale1: jnp.ndarray, scale2: jnp.ndarray,  # scaleFactor^octave per feat
    valid: jnp.ndarray,
    T1w: jnp.ndarray, T2w: jnp.ndarray,        # (4, 4) / (N, 4, 4) poses
    fx, fy, cx, cy, bf,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LocalMapping::CreateNewMapPoints triangulation core: DLT when
    parallax allows, stereo backprojection otherwise; full check battery.
    T2w may be per-pair (N, 4, 4) so pairs against MANY neighbor keyframes
    triangulate in one launch (the batched keyframe event).
    Returns (points_w (N, 3), good (N,))."""
    n = xy1.shape[0]
    if T2w.ndim == 2:
        T2w = jnp.broadcast_to(T2w, (n, 4, 4))
    R1, t1 = T1w[:3, :3], T1w[:3, 3]
    R2, t2 = T2w[:, :3, :3], T2w[:, :3, 3]          # (N, 3, 3), (N, 3)
    O1 = -R1.T @ t1
    O2 = -jnp.einsum("nji,nj->ni", R2, t2)          # (N, 3)

    xn1 = jnp.stack(
        [(xy1[:, 0] - cx) / fx, (xy1[:, 1] - cy) / fy, jnp.ones(xy1.shape[0])],
        axis=1,
    )
    xn2 = jnp.stack(
        [(xy2[:, 0] - cx) / fx, (xy2[:, 1] - cy) / fy, jnp.ones(xy2.shape[0])],
        axis=1,
    )
    ray1 = xn1 @ R1  # world-frame rays (R^T xn)
    ray2 = jnp.einsum("ni,nij->nj", xn2, R2)
    cos_par = jnp.sum(ray1 * ray2, axis=1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=1) * jnp.linalg.norm(ray2, axis=1), 1e-12
    )
    # stereo parallax (LocalMapping.cc:373-382)
    cos_stereo1 = jnp.where(
        depth1 > 0, jnp.cos(2.0 * jnp.arctan2(bf / fx / 2.0, depth1)), 1e9
    )
    cos_stereo2 = jnp.where(
        depth2 > 0, jnp.cos(2.0 * jnp.arctan2(bf / fx / 2.0, depth2)), 1e9
    )
    cos_stereo = jnp.minimum(cos_stereo1, cos_stereo2)

    # DLT triangulation
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)
    P2 = jnp.concatenate([R2, t2[..., None]], axis=2)   # (N, 3, 4)

    def dlt(a, b, p2):
        A = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * p2[2] - p2[0],
                b[1] * p2[2] - p2[1],
            ]
        )
        # nullspace of A = eigenvector of AᵀA (4x4 symmetric PSD) at the
        # smallest eigenvalue — the same subspace as the smallest right-
        # singular vector the reference takes from cv::SVD
        # (LocalMapping.cc:397), but eigh's batched small-matrix path is
        # far cheaper than SVD on TPU
        _w, V = jnp.linalg.eigh(A.T @ A)
        X = V[:, 0]  # ascending eigenvalues
        return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)

    X_dlt = jax.vmap(dlt)(xn1, xn2, P2)

    # stereo backprojection fallbacks
    xc1 = jnp.stack(
        [(xy1[:, 0] - cx) * depth1 / fx, (xy1[:, 1] - cy) * depth1 / fy,
         depth1], axis=1,
    )
    Twc1 = jnp.linalg.inv(T1w)
    X_s1 = xc1 @ Twc1[:3, :3].T + Twc1[:3, 3]
    xc2 = jnp.stack(
        [(xy2[:, 0] - cx) * depth2 / fx, (xy2[:, 1] - cy) * depth2 / fy,
         depth2], axis=1,
    )
    # camera -> world without a batched 4x4 inverse: X = R^T (xc - t)
    X_s2 = jnp.einsum("nji,nj->ni", R2, xc2 - t2)

    use_dlt = (cos_par < jnp.minimum(cos_stereo, 0.9998)) & (cos_par > 0)
    use_s1 = ~use_dlt & (depth1 > 0) & (cos_stereo1 <= cos_stereo2)
    use_s2 = ~use_dlt & ~use_s1 & (depth2 > 0)
    X = jnp.where(
        use_dlt[:, None], X_dlt,
        jnp.where(use_s1[:, None], X_s1, X_s2),
    )
    has_source = use_dlt | use_s1 | use_s2

    def checks(pc, xy, ur, sig2):
        z = pc[:, 2]
        u = fx * pc[:, 0] / jnp.maximum(z, 1e-9) + cx
        v = fy * pc[:, 1] / jnp.maximum(z, 1e-9) + cy
        e2 = (u - xy[:, 0]) ** 2 + (v - xy[:, 1]) ** 2
        ur_pred = u - bf / jnp.maximum(z, 1e-9)
        e2_st = e2 + jnp.where(ur > 0, (ur_pred - ur) ** 2, 0.0)
        th = jnp.where(ur > 0, 7.8, 5.991) * sig2
        return (z > 0) & (e2_st < th), z

    ok1, z1 = checks(X @ R1.T + t1, xy1, ur1, sigma2_1)
    ok2, z2 = checks(
        jnp.einsum("nij,nj->ni", R2, X) + t2, xy2, ur2, sigma2_2
    )

    # scale-consistency (LocalMapping.cc:489-503)
    d1 = jnp.linalg.norm(X - O1[None], axis=1)
    d2 = jnp.linalg.norm(X - O2, axis=1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-12)
    ratio_oct = scale1 / jnp.maximum(scale2, 1e-12)
    ratio_factor = 1.5 * 1.2  # 1.5 * scaleFactor
    scale_ok = (ratio_dist <= ratio_oct * ratio_factor) & (
        ratio_dist >= ratio_oct / ratio_factor
    )

    good = (
        valid & has_source & jnp.all(jnp.isfinite(X), axis=1)
        & ok1 & ok2 & scale_ok & (d1 > 0) & (d2 > 0)
    )
    return X, good

"""BoW-restricted descriptor matching (ORBmatcher::SearchByBoW).

The reference walks aligned DBoW2 FeatureVector node buckets and compares
descriptors only within the same vocabulary node (ORBmatcher.cc:546-700).
The TPU form: one dense Hamming matrix masked by node-id equality — the
node bucketing becomes an elementwise mask instead of a sparse iteration,
plus the reference's ratio test and rotation-consistency histogram.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .hamming import hamming_matrix
from .match import rotation_consistency_mask

TH_LOW = 50
TH_HIGH = 100


@functools.partial(jax.jit, static_argnames=("check_orientation",))
def search_by_bow(
    desc_a: jnp.ndarray,     # (N, 32) keyframe descriptors
    node_a: jnp.ndarray,     # (N,) vocabulary node (at levelsup) per feature
    angle_a: jnp.ndarray,    # (N,)
    valid_a: jnp.ndarray,    # (N,) bool (feature has a map point)
    desc_b: jnp.ndarray,     # (M, 32) frame/keyframe descriptors
    node_b: jnp.ndarray,     # (M,)
    angle_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    nn_ratio: jnp.ndarray,   # mfNNratio (0.75 loop-closing, 0.7 reloc)
    check_orientation: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (assign, n): assign[i] = matched index in b for feature i of
    a, or -1. Matching is from a's features (map points) to b's keypoints."""
    dist = hamming_matrix(desc_a, desc_b)
    same_node = node_a[:, None] == node_b[None, :]
    mask = same_node & valid_a[:, None] & valid_b[None, :]
    big = jnp.int32(1 << 20)
    masked = jnp.where(mask, dist, big)

    top2_v, top2_i = jax.lax.top_k(-masked, 2)
    best_d = -top2_v[:, 0]
    best_j = top2_i[:, 0]
    second_d = -top2_v[:, 1]
    ok = (best_d <= TH_LOW) & (
        best_d.astype(jnp.float32) < nn_ratio * second_d.astype(jnp.float32)
    )

    # one-to-one: keep lowest distance per b-feature (scatter-free)
    from .match import resolve_one_to_one

    _b_assign, wins = resolve_one_to_one(best_j, best_d, ok, desc_b.shape[0])
    assign = jnp.where(wins, best_j, -1)

    if check_orientation:
        safe = jnp.maximum(assign, 0)
        keep = rotation_consistency_mask(angle_a, angle_b[safe], assign >= 0)
        assign = jnp.where(keep, assign, -1)
    return assign, jnp.sum((assign >= 0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=())
def search_by_sim3(
    # KF1 map points in KF1 camera coords + their keypoint data
    P1: jnp.ndarray, desc1: jnp.ndarray, xy1: jnp.ndarray,
    oct1: jnp.ndarray, valid1: jnp.ndarray,
    # KF2
    P2: jnp.ndarray, desc2: jnp.ndarray, xy2: jnp.ndarray,
    oct2: jnp.ndarray, valid2: jnp.ndarray,
    # Sim3 S12 (KF2-cam -> KF1-cam) as scaled rotation + translation
    sR12: jnp.ndarray, t12: jnp.ndarray,
    fx, fy, cx, cy,
    scale_factors: jnp.ndarray,
    log_scale: jnp.ndarray,
    max_dist1: jnp.ndarray,  # (N1,) mfMaxDistance per KF1 point
    max_dist2: jnp.ndarray,
    th: jnp.ndarray = 7.5,
):
    """ORBmatcher::SearchBySim3 (1146-1300 semantics): project each side's
    map points into the other through S12 / S12^-1, window-search at the
    predicted scale, and keep mutually-agreeing pairs.

    Returns (assign12 (N1,), n): KF2 feature index per KF1 feature."""
    n_levels = scale_factors.shape[0]

    def project_side(P_src, sR, t, xy_dst, oct_dst, valid_dst, max_dist_src):
        pc = P_src @ sR.T + t
        z = pc[:, 2]
        invz = 1.0 / jnp.where(z != 0, z, 1.0)
        u = fx * pc[:, 0] * invz + cx
        v = fy * pc[:, 1] * invz + cy
        ok = z > 0
        dist = jnp.linalg.norm(pc, axis=1)
        pred = jnp.ceil(
            jnp.log(jnp.maximum(max_dist_src / jnp.maximum(dist, 1e-9), 1e-9))
            / log_scale
        )
        pred = jnp.clip(pred, 0, n_levels - 1).astype(jnp.int32)
        r = th * scale_factors[pred]
        du = jnp.abs(xy_dst[None, :, 0] - u[:, None])
        dv = jnp.abs(xy_dst[None, :, 1] - v[:, None])
        window = (du < r[:, None]) & (dv < r[:, None])
        oct_ok = (oct_dst[None, :] >= pred[:, None] - 1) & (
            oct_dst[None, :] <= pred[:, None] + 1
        )
        return ok[:, None] & window & oct_ok & valid_dst[None, :]

    # S21 = S12^-1: x1 -> x2
    s2 = jnp.sum(sR12[0] * sR12[0])  # |sR row|^2 = s^2
    sR21 = sR12.T / s2
    t21 = -(sR21 @ t12)

    mask12 = project_side(P1, sR21, t21, xy2, oct2, valid2, max_dist1)
    mask21 = project_side(P2, sR12, t12, xy1, oct1, valid1, max_dist2)
    mask = mask12 & mask21.T & valid1[:, None]

    dist = hamming_matrix(desc1, desc2)
    big = jnp.int32(1 << 20)
    masked = jnp.where(mask, dist, big)
    best12 = jnp.argmin(masked, axis=1)
    d12 = jnp.take_along_axis(masked, best12[:, None], axis=1)[:, 0]
    best21 = jnp.argmin(masked, axis=0)
    mutual = best21[best12] == jnp.arange(P1.shape[0])
    ok = (d12 <= TH_HIGH) & mutual
    assign = jnp.where(ok, best12, -1)
    return assign, jnp.sum(ok.astype(jnp.int32))

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

    # one-to-one: keep lowest distance per b-feature
    m = desc_b.shape[0]
    d_claim = jnp.where(ok, best_d, big)
    best_for_b = jnp.full(m, big, jnp.int32).at[best_j].min(d_claim)
    wins = ok & (d_claim == best_for_b[best_j])
    first = (
        jnp.full(m, 1 << 30, jnp.int32)
        .at[best_j]
        .min(jnp.where(wins, jnp.arange(best_j.shape[0]), 1 << 30))
    )
    wins &= first[best_j] == jnp.arange(best_j.shape[0])
    assign = jnp.where(wins, best_j, -1)

    if check_orientation:
        safe = jnp.maximum(assign, 0)
        keep = rotation_consistency_mask(angle_a, angle_b[safe], assign >= 0)
        assign = jnp.where(keep, assign, -1)
    return assign, jnp.sum((assign >= 0).astype(jnp.int32))

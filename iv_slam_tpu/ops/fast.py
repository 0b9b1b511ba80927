"""FAST-9/16 corner detection as dense, branch-free array ops.

The reference calls cv::FAST per grid cell (ORBextractor.cc:1046-1052) with
non-max suppression. A per-cell scalar loop is the wrong shape for a TPU;
here the segment test runs over the whole image at once on the VPU:

  1. 16 circle samples per pixel via static shifts (no gathers),
  2. "9 consecutive of 16" arc test via a log-step circular min-reduction,
  3. OpenCV-compatible corner score (max threshold keeping the corner),
  4. 3x3 non-max suppression as an elementwise max-pool compare.

Because the reference's cell windows overlap by exactly 2x the 3-pixel FAST
border, per-cell detection is equivalent to whole-image detection tiled into
cells (see ops/extractor.py), so one dense pass reproduces its semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, in circular order, as (dy, dx) (OpenCV
# makeOffsets ordering; any rotation of this ring is detection-equivalent).
CIRCLE = np.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    ],
    dtype=np.int32,
)


def _circle_diffs(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) uint8 -> (16, H, W) int16 diffs circle[i] - center.

    Shifted copies via jnp.roll; the 3-pixel border is invalid and masked by
    the caller (cv::FAST likewise ignores a 3-pixel border).
    """
    center = img.astype(jnp.int16)
    diffs = []
    for dy, dx in CIRCLE:
        shifted = jnp.roll(center, shift=(-dy, -dx), axis=(0, 1))
        diffs.append(shifted - center)
    return jnp.stack(diffs, axis=0)


def _circular_min9(d: jnp.ndarray) -> jnp.ndarray:
    """For each of 16 circular start positions: min over the 9-window.

    d: (16, H, W) -> (16, H, W) where out[i] = min(d[i], d[i+1], ..., d[i+8]).
    Log-step reduction: window1 -> 2 -> 4 -> 8 -> 9.
    """
    m1 = jnp.minimum(d, jnp.roll(d, -1, axis=0))          # window 2
    m2 = jnp.minimum(m1, jnp.roll(m1, -2, axis=0))        # window 4
    m4 = jnp.minimum(m2, jnp.roll(m2, -4, axis=0))        # window 8
    return jnp.minimum(m4, jnp.roll(d, -8, axis=0))       # window 9


def fast_score(img: jnp.ndarray, threshold: int) -> jnp.ndarray:
    """FAST-9/16 corner response map, OpenCV semantics.

    Returns (H, W) int16: 0 where not a corner at `threshold`, else the
    corner score (the maximal threshold at which the segment test still
    passes, minus 1 — matching cv::FAST's cornerScore<16> with K=8).
    A 3-pixel border is always 0.
    """
    h, w = img.shape
    d = _circle_diffs(img)  # (16, H, W) int16

    bright9 = _circular_min9(d)         # min of d over each 9-arc
    dark9 = _circular_min9(-d)          # min of -d over each 9-arc

    bscore = jnp.max(bright9, axis=0)   # best bright arc
    dscore = jnp.max(dark9, axis=0)     # best dark arc
    score = jnp.maximum(bscore, dscore) - 1
    is_corner = score >= threshold      # arc min > threshold <=> score+1 > th

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(is_corner & interior, score, 0).astype(jnp.int16)


def nonmax_suppress(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression: keep strictly-greater-than-neighbors maxima.

    Matches cv::FAST(nonmaxSuppression=true): a corner survives iff its score
    is strictly greater than the scores of its 8 neighbors (ties suppressed
    on both sides, as in OpenCV's row-wise comparisons).
    """
    s = score.astype(jnp.int16)
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh.append(jnp.roll(s, shift=(dy, dx), axis=(0, 1)))
    nmax = neigh[0]
    for n in neigh[1:]:
        nmax = jnp.maximum(nmax, n)
    return jnp.where(s > nmax, s, 0)


def detect(img: jnp.ndarray, threshold: int, nonmax: bool = True) -> jnp.ndarray:
    """Full FAST pass: (H, W) uint8 -> (H, W) int16 response map."""
    s = fast_score(img, threshold)
    return nonmax_suppress(s) if nonmax else s

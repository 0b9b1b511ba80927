"""Keypoint orientation (intensity centroid) + OpenCV-exact fastAtan2.

Replaces IC_Angle / computeOrientation (ORBextractor.cc:78-105, 478-487).
Instead of a scalar loop over the circular patch, the masked first moments
are two static weight matrices, so orientation for all keypoints in a level
is one (N, 961) x (961, 2) matmul on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15
PATCH = 2 * HALF_PATCH + 1  # 31

# OpenCV fastAtan2 polynomial (degrees); accuracy ~0.3 deg — reproduced
# exactly so descriptor bit patterns match the reference's rotations.
_P1 = np.float32(0.9997878412794807 * (180.0 / np.pi))
_P3 = np.float32(-0.3258083974640975 * (180.0 / np.pi))
_P5 = np.float32(0.1555786518463281 * (180.0 / np.pi))
_P7 = np.float32(-0.04432655554792128 * (180.0 / np.pi))
_DBL_EPS = np.float32(2.220446049250313e-16)


def umax_table() -> np.ndarray:
    """Circular-patch row extents, symmetric (ORBextractor.cc:460-477)."""
    umax = np.zeros(HALF_PATCH + 1, dtype=np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(np.rint(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


@functools.lru_cache(maxsize=1)
def moment_weights() -> tuple:
    """(961,) u-weights and v-weights for the masked intensity centroid."""
    umax = umax_table()
    u = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    uu, vv = np.meshgrid(u, u)  # vv rows, uu cols; signed coords
    mask = np.abs(uu) <= umax[np.abs(vv)]
    wu = (uu * mask).astype(np.float32).reshape(-1)
    wv = (vv * mask).astype(np.float32).reshape(-1)
    return wu, wv


def fast_atan2_deg(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """cv::fastAtan2 (degrees in [0, 360)), bit-faithful float32 math."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    c_lo = ay / (ax + _DBL_EPS)
    c_hi = ax / (ay + _DBL_EPS)
    c = jnp.where(ax >= ay, c_lo, c_hi)
    c2 = c * c
    poly = (((_P7 * c2 + _P5) * c2 + _P3) * c2 + _P1) * c
    a = jnp.where(ax >= ay, poly, 90.0 - poly)
    a = jnp.where(x < 0, 180.0 - a, a)
    a = jnp.where(y < 0, 360.0 - a, a)
    return a


def ic_angles(img: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Orientations for keypoints on one pyramid level.

    img: (H, W) uint8; yx: (N, 2) int32 (row, col), must be >= 15 from the
    border (guaranteed by the extractor's EDGE_THRESHOLD=19 margins).
    Returns (N,) float32 degrees.
    """
    wu, wv = moment_weights()
    patches = extract_patches(img, yx, HALF_PATCH)  # (N, 31, 31)
    flat = patches.reshape(patches.shape[0], -1).astype(jnp.float32)
    w = jnp.stack([jnp.asarray(wu), jnp.asarray(wv)], axis=1)  # (961, 2)
    m = flat @ w  # (N, 2): m10, m01
    return fast_atan2_deg(m[:, 1], m[:, 0])


@functools.lru_cache(maxsize=1)
def _row_extents() -> np.ndarray:
    """(31,) circular-patch half-width per row offset v = -15..15."""
    umax = umax_table()
    v = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    return umax[np.abs(v)].astype(np.int32)


def ic_angles_integral(img: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """IC orientation via per-row prefix sums — exact integer moments with
    124 gathered elements per keypoint instead of 961 patch pixels.

    For each row offset v the circular mask covers u in [-a, a] with
    a = umax[|v|] (ORBextractor.cc:460-477), so with per-row prefix sums
    S(y, x) = sum_{x' <= x} I(y, x') and W(y, x) = sum_{x' <= x} x' I(y, x'):

      m01 = sum_v v * (S[y+v, x+a] - S[y+v, x-a-1])
      m10 = sum_v (W[y+v, x+a] - W[y+v, x-a-1]) - x * (S diff)

    Row sums stay < 2^31 (255 * 1241^2 for KITTI-wide rows), so int32
    arithmetic is exact and the angles are bit-identical to ic_angles
    (same moments, same fastAtan2)."""
    h, w = img.shape
    i32 = img.astype(jnp.int32)
    # prefix sums padded with a leading zero column so x-a-1 = -1 maps to 0
    S = jnp.pad(jnp.cumsum(i32, axis=1), ((0, 0), (1, 0)))
    W = jnp.pad(
        jnp.cumsum(i32 * jnp.arange(w, dtype=jnp.int32)[None, :], axis=1),
        ((0, 0), (1, 0)),
    )
    a = jnp.asarray(_row_extents())               # (31,)
    v = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)   # (31,)
    rows = yx[:, 0:1] + v[None, :]                # (N, 31)
    hi = yx[:, 1:2] + a[None, :] + 1              # x + a (+1 for pad)
    lo = yx[:, 1:2] - a[None, :]                  # x - a - 1 (+1 for pad)
    wp = w + 1
    flat_hi = rows * wp + hi
    flat_lo = rows * wp + lo
    Sf, Wf = S.reshape(-1), W.reshape(-1)
    s_diff = jnp.take(Sf, flat_hi) - jnp.take(Sf, flat_lo)   # (N, 31)
    w_diff = jnp.take(Wf, flat_hi) - jnp.take(Wf, flat_lo)
    m01 = jnp.sum(v[None, :] * s_diff, axis=1)
    m10 = jnp.sum(w_diff, axis=1) - yx[:, 1] * jnp.sum(s_diff, axis=1)
    return fast_atan2_deg(m01.astype(jnp.float32), m10.astype(jnp.float32))


def extract_patches(img: jnp.ndarray, yx: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather (2r+1)^2 patches around integer centers via vmapped slices."""
    size = 2 * radius + 1

    def one(c):
        return jax.lax.dynamic_slice(img, (c[0] - radius, c[1] - radius), (size, size))

    return jax.vmap(one)(yx)


def ic_angles_conv(img: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Orientation via whole-image moment convolutions.

    Instead of gathering a 31x31 patch per keypoint (N x 961 gather
    elements — slow on TPU), convolve the level once with the two static
    moment kernels (an MXU conv) and gather just 2 values per keypoint.
    Identical results to ic_angles (same masked sums, same fastAtan2)."""
    wu, wv = moment_weights()
    kern = np.stack([wu, wv], axis=0).reshape(2, PATCH, PATCH)
    k = jnp.asarray(kern[:, None])  # (2, 1, 31, 31) OIHW
    x = img.astype(jnp.float32)[None, None]  # (1, 1, H, W)
    moments = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=[(HALF_PATCH, HALF_PATCH)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]  # (2, H, W)
    m10 = moments[0][yx[:, 0], yx[:, 1]]
    m01 = moments[1][yx[:, 0], yx[:, 1]]
    return fast_atan2_deg(m01, m10)

"""Rotated BRIEF (rBRIEF) 256-bit descriptors.

Replaces computeOrbDescriptor (ORBextractor.cc:108-148): for each keypoint,
the 512-point learned sampling pattern is rotated by the keypoint angle with
cvRound (round-half-even) integer snapping, and 256 brightness comparisons
are packed into 32 bytes. The pattern table (brief_pattern.npy) is the
standard OpenCV ORB ``bit_pattern_31_`` learned pattern (public data).

TPU shape: patches are pre-gathered (N, 39, 39) so the rotated lookups are
(N, 512) in-register gathers from VMEM-resident patches, and bit packing is
a (N, 256) x (256,) weighted reduction.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .orient import extract_patches

PATCH_RADIUS = 19  # max rotated pattern offset is 18 (|p| <= 13*sqrt(2))
PATCH_SIZE = 2 * PATCH_RADIUS + 1  # 39
_FACTOR_PI = np.float32(np.pi / 180.0)


@functools.lru_cache(maxsize=1)
def pattern() -> np.ndarray:
    """(512, 2) int32 sampling offsets (x, y)."""
    path = os.path.join(os.path.dirname(__file__), "brief_pattern.npy")
    return np.load(path).reshape(512, 2)


def descriptors(
    blurred: jnp.ndarray, yx: jnp.ndarray, angles_deg: jnp.ndarray
) -> jnp.ndarray:
    """Compute descriptors on one pyramid level.

    blurred: (H, W) uint8 (7x7 sigma=2 Gaussian, as the reference);
    yx: (N, 2) int32 keypoint (row, col); angles_deg: (N,) float32.
    Returns (N, 32) uint8.
    """
    pat = jnp.asarray(pattern(), dtype=jnp.float32)  # (512, 2) [x, y]
    ang = angles_deg.astype(jnp.float32) * _FACTOR_PI
    a = jnp.cos(ang)[:, None]  # (N, 1)
    b = jnp.sin(ang)[:, None]
    px, py = pat[None, :, 0], pat[None, :, 1]  # (1, 512)
    # reference: row offset = cvRound(x*b + y*a), col = cvRound(x*a - y*b)
    rows = jnp.rint(px * b + py * a).astype(jnp.int32) + PATCH_RADIUS
    cols = jnp.rint(px * a - py * b).astype(jnp.int32) + PATCH_RADIUS

    patches = extract_patches(blurred, yx, PATCH_RADIUS)  # (N, 39, 39)
    flat = patches.reshape(patches.shape[0], -1)
    vals = jnp.take_along_axis(flat, rows * PATCH_SIZE + cols, axis=1)  # (N, 512)

    t0 = vals[:, 0::2].astype(jnp.int32)
    t1 = vals[:, 1::2].astype(jnp.int32)
    bits = (t0 < t1).astype(jnp.uint8)  # (N, 256)
    weights = jnp.asarray(1 << np.arange(8, dtype=np.uint8), dtype=jnp.uint8)
    return jnp.sum(
        bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1, dtype=jnp.uint8
    )


def descriptors_global_gather(
    blurred: jnp.ndarray, yx: jnp.ndarray, angles_deg: jnp.ndarray
) -> jnp.ndarray:
    """Descriptors via one flat (N, 512) gather from the blurred image
    instead of per-keypoint 39x39 patch slices — 3x fewer gathered elements
    (bit-identical to `descriptors`; keypoints are >= 19 px from borders so
    no clamping is ever active)."""
    h, w = blurred.shape
    pat = jnp.asarray(pattern(), dtype=jnp.float32)
    ang = angles_deg.astype(jnp.float32) * _FACTOR_PI
    a = jnp.cos(ang)[:, None]
    b = jnp.sin(ang)[:, None]
    px, py = pat[None, :, 0], pat[None, :, 1]
    rows = jnp.rint(px * b + py * a).astype(jnp.int32) + yx[:, 0:1]
    cols = jnp.rint(px * a - py * b).astype(jnp.int32) + yx[:, 1:2]
    flat_idx = jnp.clip(rows, 0, h - 1) * w + jnp.clip(cols, 0, w - 1)
    vals = jnp.take(blurred.reshape(-1), flat_idx.reshape(-1)).reshape(
        yx.shape[0], 512
    )
    t0 = vals[:, 0::2].astype(jnp.int32)
    t1 = vals[:, 1::2].astype(jnp.int32)
    bits = (t0 < t1).astype(jnp.uint8)
    weights = jnp.asarray(1 << np.arange(8, dtype=np.uint8), dtype=jnp.uint8)
    return jnp.sum(
        bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1, dtype=jnp.uint8
    )


def descriptors_onehot_mxu(
    blurred: jnp.ndarray, yx: jnp.ndarray, angles_deg: jnp.ndarray
) -> jnp.ndarray:
    """Descriptors with the 512 rotated-pattern lookups expressed as
    one-hot matmuls instead of a flat gather: a (N, 512, 39) row-selector
    batched-matmuls the (N, 39, 39) patches on the MXU, then a column
    one-hot mask-reduce picks the element. Exactly one term of each
    reduction is non-zero and uint8 pixel values are exact in bfloat16
    (integers <= 256), so the result is bit-identical to `descriptors` /
    `descriptors_global_gather`. Gather traffic per keypoint drops from
    512 random elements to 39 contiguous rows (the patch slices)."""
    pat = jnp.asarray(pattern(), dtype=jnp.float32)
    ang = angles_deg.astype(jnp.float32) * _FACTOR_PI
    a = jnp.cos(ang)[:, None]
    b = jnp.sin(ang)[:, None]
    px, py = pat[None, :, 0], pat[None, :, 1]
    rows = jnp.rint(px * b + py * a).astype(jnp.int32) + PATCH_RADIUS
    cols = jnp.rint(px * a - py * b).astype(jnp.int32) + PATCH_RADIUS
    patches = extract_patches(blurred, yx, PATCH_RADIUS)  # (N, 39, 39)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, PATCH_SIZE), 2)
    oh_r = (rows[:, :, None] == iota).astype(jnp.bfloat16)  # (N, 512, 39)
    oh_c = (cols[:, :, None] == iota).astype(jnp.float32)
    sel = jnp.einsum(
        "nsr,nrc->nsc", oh_r, patches.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    vals = jnp.sum(sel * oh_c, axis=-1).astype(jnp.int32)  # (N, 512)
    t0 = vals[:, 0::2]
    t1 = vals[:, 1::2]
    bits = (t0 < t1).astype(jnp.uint8)
    weights = jnp.asarray(1 << np.arange(8, dtype=np.uint8), dtype=jnp.uint8)
    return jnp.sum(
        bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1, dtype=jnp.uint8
    )


def descriptors_from_patches(
    patches: jnp.ndarray, angles_deg: jnp.ndarray
) -> jnp.ndarray:
    """Descriptors from pre-gathered (N, 39, 39) blurred patches (any float
    dtype holding uint8 pixel values exactly) — the one-hot MXU lookup of
    `descriptors_onehot_mxu` with the patch gather factored out (the Pallas
    finish kernel produces the patches; ops/finish_pallas.py)."""
    pat = jnp.asarray(pattern(), dtype=jnp.float32)
    ang = angles_deg.astype(jnp.float32) * _FACTOR_PI
    a = jnp.cos(ang)[:, None]
    b = jnp.sin(ang)[:, None]
    px, py = pat[None, :, 0], pat[None, :, 1]
    rows = jnp.rint(px * b + py * a).astype(jnp.int32) + PATCH_RADIUS
    cols = jnp.rint(px * a - py * b).astype(jnp.int32) + PATCH_RADIUS
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, PATCH_SIZE), 2)
    oh_r = (rows[:, :, None] == iota).astype(jnp.bfloat16)  # (N, 512, 39)
    oh_c = (cols[:, :, None] == iota).astype(jnp.float32)
    sel = jnp.einsum(
        "nsr,nrc->nsc", oh_r, patches.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    vals = jnp.sum(sel * oh_c, axis=-1).astype(jnp.int32)  # (N, 512)
    t0 = vals[:, 0::2]
    t1 = vals[:, 1::2]
    bits = (t0 < t1).astype(jnp.uint8)
    weights = jnp.asarray(1 << np.arange(8, dtype=np.uint8), dtype=jnp.uint8)
    return jnp.sum(
        bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1, dtype=jnp.uint8
    )


def pack_u32(desc_u8: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 -> (N, 8) uint32 little-endian words (for Hamming ops)."""
    d = desc_u8.astype(jnp.uint32).reshape(-1, 8, 4)
    shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
    return jnp.sum(d << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def unpack_pm1(desc_u8: jnp.ndarray, dtype=jnp.int8) -> jnp.ndarray:
    """(N, 32) uint8 -> (N, 256) +-1 matrix for MXU Hamming (see hamming.py)."""
    bits = jnp.unpackbits(desc_u8, axis=-1, bitorder="little")
    return (bits.astype(jnp.int8) * 2 - 1).astype(dtype)

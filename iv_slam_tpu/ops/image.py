"""Dense image ops: bilinear resize, Gaussian blur, reflected borders.

TPU-native replacements for the cv::resize / cv::GaussianBlur /
cv::copyMakeBorder calls in the reference's pyramid builder
(ORBextractor.cc:1298-1323) and descriptor pre-blur (ORBextractor.cc:1277).
Everything is expressed as XLA-fusable jnp ops over (H, W) or (B, H, W)
arrays; float math with final rounding (OpenCV's 8U paths use fixed-point —
results match within 1 LSB, see tests/test_image_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize(..., INTER_LINEAR) semantics: half-pixel centers, edge clamp.

    img: (..., H, W) float32 or uint8; returns same dtype (uint8 rounded).
    """
    in_h, in_w = img.shape[-2], img.shape[-1]
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)

    scale_y = in_h / out_h
    scale_x = in_w / out_w
    sy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * scale_y - 0.5
    sx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * scale_x - 0.5
    y0 = jnp.clip(jnp.floor(sy), 0, in_h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(sx), 0, in_w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, in_h - 1)
    x1 = jnp.minimum(x0 + 1, in_w - 1)
    wy = jnp.clip(sy - y0.astype(jnp.float32), 0.0, 1.0)
    wx = jnp.clip(sx - x0.astype(jnp.float32), 0.0, 1.0)

    top = x[..., y0, :]
    bot = x[..., y1, :]
    rows = top * (1.0 - wy)[:, None] + bot * wy[:, None]
    left = rows[..., :, x0]
    right = rows[..., :, x1]
    out = left * (1.0 - wx) + right * wx
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(orig_dtype)
    return out


def reflect101_pad(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """cv::BORDER_REFLECT_101 padding (gfedcb|abcdefgh|gfedcba) on last 2 dims."""
    return jnp.pad(
        img,
        [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)],
        mode="reflect",
    )


@functools.lru_cache(maxsize=8)
def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics (float64, normalized)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(r * r) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with BORDER_REFLECT_101 (cv2.GaussianBlur).

    img: (..., H, W); uint8 in -> uint8 out (rounded).
    """
    orig_dtype = img.dtype
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2
    x = reflect101_pad(img.astype(jnp.float32), pad)
    # Horizontal then vertical pass as weighted sums of shifted slices; XLA
    # fuses these into one loop, and on TPU this stays in registers/VMEM.
    h = img.shape[-2]
    w = img.shape[-1]
    xh = sum(k[i] * x[..., pad:pad + h, i:i + w] for i in range(ksize))
    # separable: vertical pass over the horizontally-blurred image
    xh_p = jnp.pad(xh, [(0, 0)] * (img.ndim - 2) + [(pad, pad), (0, 0)], mode="reflect")
    out = sum(k[i] * xh_p[..., i:i + h, :] for i in range(ksize))
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(orig_dtype)
    return out

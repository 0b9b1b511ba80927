"""Gaussian-process heatmap interpolation (feature_evaluator.cpp:1919-1976).

Sparse per-keypoint error scores are interpolated into a dense "bad region
heatmap" with GP regression: RBF kernel (s_f = 80, l = 100), observation
noise s_n = 20, evaluated at the centers of 40x40 bins on a 20-px stride
grid (feature_evaluator.h:390-393).

The reference's O(N^3) explicit matrix inverse (Kmatrix) becomes a batched
Cholesky solve over a fixed-capacity padded point set; the grid prediction
is one (G, N) x (N,) matmul for means and a triangular multi-RHS solve for
variances — all fused under jit on the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .image import resize_bilinear


def grid_shape(img_h: int, img_w: int, bin_size: int = 40, stride: int = 20):
    bnx = int((img_w - bin_size) // stride) + 1
    bny = int((img_h - bin_size) // stride) + 1
    out_w = (bnx - 1) * stride + bin_size
    out_h = (bny - 1) * stride + bin_size
    return bny, bnx, out_h, out_w


def _rbf(a: jnp.ndarray, b: jnp.ndarray, s_f: float, ell: float) -> jnp.ndarray:
    d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return (s_f * s_f) * jnp.exp(-d2 / (2.0 * ell * ell))


@functools.partial(
    jax.jit,
    static_argnames=("bny", "bnx", "bin_size", "stride", "s_f", "ell", "s_n"),
)
def gp_grid_predict(
    points: jnp.ndarray,   # (N, 2) keypoint (x, y), padded
    values: jnp.ndarray,   # (N,) error values, padded
    valid: jnp.ndarray,    # (N,) bool
    bny: int,
    bnx: int,
    bin_size: int = 40,
    stride: int = 20,
    s_f: float = 80.0,
    ell: float = 100.0,
    s_n: float = 20.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean, variance) over the (bny, bnx) bin grid."""
    n = points.shape[0]
    K = _rbf(points, points, s_f, ell)
    vmask = valid[:, None] & valid[None, :]
    K = jnp.where(vmask, K, 0.0)
    K = K + (s_n * s_n) * jnp.eye(n)
    # invalid rows/cols reduce to s_n^2 * e_i — harmless identity-like rows
    L = jnp.linalg.cholesky(K)

    gx = (jnp.arange(bnx) * stride + bin_size / 2.0).astype(jnp.float32)
    gy = (jnp.arange(bny) * stride + bin_size / 2.0).astype(jnp.float32)
    gxx, gyy = jnp.meshgrid(gx, gy)  # (bny, bnx)
    grid = jnp.stack([gxx.reshape(-1), gyy.reshape(-1)], axis=-1)  # (G, 2)

    Kv = _rbf(grid, points, s_f, ell)  # (G, N)
    Kv = jnp.where(valid[None, :], Kv, 0.0)

    y = jnp.where(valid, values, 0.0)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    mean = Kv @ alpha  # (G,)

    # variance = s_f^2 - k*^T K^-1 k*
    W = jax.scipy.linalg.solve_triangular(L, Kv.T, lower=True)  # (N, G)
    var = (s_f * s_f) - jnp.sum(W * W, axis=0)

    return mean.reshape(bny, bnx), var.reshape(bny, bnx)


def heatmap_from_grid(
    grid_vals: jnp.ndarray,
    out_h: int,
    out_w: int,
    err_min: float = 0.0,
    err_max: float = 1.5,
) -> jnp.ndarray:
    """GenerateErrHeatmap + resize + CV_8U conversion
    (feature_evaluator.cpp:3074-3112, 690-698): clamp-scale to [0, 1],
    bilinear-resize to the cropped image size, x255 -> uint8."""
    scaled = jnp.clip((grid_vals - err_min) / (err_max - err_min), 0.0, 1.0)
    up = resize_bilinear(scaled, out_h, out_w)
    return jnp.clip(jnp.rint(up * 255.0), 0, 255).astype(jnp.uint8)


def hist2d_heatmap(
    points: jnp.ndarray,    # (N, 2) keypoint (x, y)
    values: jnp.ndarray,    # (N,) error values
    valid: jnp.ndarray,
    bny: int,
    bnx: int,
    bin_size: int = 40,
    stride: int = 20,
    err_min: float = 0.0,
) -> jnp.ndarray:
    """Sliding-window histogram heatmap — the reference's non-GP variant
    (GenerateImageQualityHeatmap + Hist2D, fe.cpp:459-541, 3114-3181):
    each (bin_size x bin_size) window (stride-spaced) averages the error
    values of the keypoints inside it; empty bins default to err_min.

    TPU shape: membership is a dense (bins, N) containment mask and the
    bin sums are two matmuls."""
    gx = (jnp.arange(bnx) * stride).astype(jnp.float32)
    gy = (jnp.arange(bny) * stride).astype(jnp.float32)
    gxx, gyy = jnp.meshgrid(gx, gy)  # (bny, bnx) window origins
    x0 = gxx.reshape(-1)[:, None]
    y0 = gyy.reshape(-1)[:, None]
    px = points[None, :, 0]
    py = points[None, :, 1]
    inside = (
        (px >= x0) & (px < x0 + bin_size)
        & (py >= y0) & (py < y0 + bin_size)
        & valid[None, :]
    ).astype(jnp.float32)
    freq = inside @ jnp.ones_like(values)
    sums = inside @ jnp.where(valid, values, 0.0)
    mean = jnp.where(freq > 0, sums / jnp.maximum(freq, 1.0), err_min)
    return mean.reshape(bny, bnx)


def mask_from_variance(
    grid_var: jnp.ndarray,
    out_h: int,
    out_w: int,
    var_max: float = 100.0,
    var_thresh: float = 0.5,
) -> jnp.ndarray:
    """Unsupervised reliability mask (feature_evaluator.cpp:766-791):
    normalize variance by var_max, upscale, binary-inverse threshold at
    0.5 -> {0, 255} uint8 (255 = reliable)."""
    scaled = jnp.clip(grid_var / var_max, 0.0, 1.0)
    up = resize_bilinear(scaled, out_h, out_w)
    return jnp.where(up > var_thresh, 0, 255).astype(jnp.uint8)

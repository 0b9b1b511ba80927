"""Stereo keypoint matching (Frame::ComputeStereoMatches, Frame.cc:758-932).

Batched TPU reformulation of the reference's per-keypoint scalar search:

  1. full left x right Hamming matrix on the MXU, masked by the epipolar row
     band (|row(vL) - vR| <= 2 * scale^octaveR), +-1 octave agreement and the
     disparity window [uL - bf/fx_b, uL]  -> masked argmin;
  2. sub-pixel refinement: 11x11 SAD over a +-5 px slide at the keypoint's
     pyramid level, parabola fit — all levels gathered from one flattened
     pyramid canvas so octave indexing is a single dynamic slice per point;
  3. median-SAD outlier rejection (dist < 1.5 * 1.4 * median).

Returns per-left-keypoint (u_right, depth), -1 where unmatched.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hamming import hamming_matrix

TH_HIGH = 100
TH_LOW = 50
_W = 5          # SAD half-window
_L = 5          # slide half-range
_WIN = 2 * _W + 1
_STRIP = 2 * (_W + _L) + 1  # 21


def flatten_pyramid(levels: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, np.ndarray]:
    """Stack variable-size levels into one (..., sum_h, w0) canvas.

    Returns (canvas, row_offsets[n_levels]) — a keypoint at native-level
    (y, x), octave l lives at canvas row offsets[l] + y. Levels may carry
    leading batch dims.
    """
    w0 = levels[0].shape[-1]
    padded = [
        jnp.pad(
            lv,
            [(0, 0)] * (lv.ndim - 1) + [(0, w0 - lv.shape[-1])],
        )
        for lv in levels
    ]
    offsets = np.cumsum([0] + [lv.shape[-2] for lv in levels[:-1]])
    return jnp.concatenate(padded, axis=-2), offsets


@functools.partial(
    jax.jit, static_argnames=("max_disparity_is_fx", "use_pallas_sad")
)
def match_stereo(
    kpL_xy: jnp.ndarray,      # (N, 2) level-0 float (u, v)
    kpL_oct: jnp.ndarray,     # (N,) int32
    kpL_desc: jnp.ndarray,    # (N, 32) u8
    kpL_valid: jnp.ndarray,   # (N,) bool
    kpR_xy: jnp.ndarray,      # (M, 2)
    kpR_oct: jnp.ndarray,
    kpR_desc: jnp.ndarray,
    kpR_valid: jnp.ndarray,
    canvasL: jnp.ndarray,     # flattened left pyramid
    canvasR: jnp.ndarray,     # flattened right pyramid
    level_offsets: jnp.ndarray,   # (n_levels,) int32 canvas row offsets
    level_widths: jnp.ndarray,    # (n_levels,) int32 native level widths
    scale_factors: jnp.ndarray,   # (n_levels,) float32
    bf: jnp.ndarray,              # scalar: baseline * fx
    min_z: jnp.ndarray,           # scalar: baseline (minZ = mb)
    max_disparity_is_fx: bool = True,
    use_pallas_sad: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = kpL_xy.shape[0]
    th_orb = (TH_HIGH + TH_LOW) // 2

    # --- stage 1: banded Hamming argmin -----------------------------------
    dist = hamming_matrix(kpL_desc, kpR_desc)  # (N, M)
    uL = kpL_xy[:, 0][:, None]
    vL_row = jnp.floor(kpL_xy[:, 1])[:, None]  # int row table index semantics
    uR = kpR_xy[:, 0][None, :]
    vR = kpR_xy[:, 1][None, :]
    r_band = 2.0 * scale_factors[kpR_oct][None, :]
    in_band = (vL_row >= jnp.floor(vR - r_band)) & (vL_row <= jnp.ceil(vR + r_band))
    oct_ok = jnp.abs(kpR_oct[None, :] - kpL_oct[:, None]) <= 1
    max_d = bf / min_z
    disp_ok = (uR >= uL - max_d) & (uR <= uL)
    mask = (
        in_band & oct_ok & disp_ok
        & kpL_valid[:, None] & kpR_valid[None, :]
    )
    big = jnp.int32(1 << 20)
    masked = jnp.where(mask, dist, big)
    best_r = jnp.argmin(masked, axis=1)
    best_d = jnp.take_along_axis(masked, best_r[:, None], axis=1)[:, 0]
    cand_ok = best_d < th_orb

    # --- stage 2: SAD sub-pixel refinement --------------------------------
    inv_scale = 1.0 / scale_factors[kpL_oct]
    su_l = jnp.round(kpL_xy[:, 0] * inv_scale).astype(jnp.int32)
    sv_l = jnp.round(kpL_xy[:, 1] * inv_scale).astype(jnp.int32)
    uR0 = kpR_xy[best_r, 0]
    su_r0 = jnp.round(uR0 * inv_scale).astype(jnp.int32)
    lw = level_widths[kpL_oct]
    off = level_offsets[kpL_oct]

    # reference bounds check (Frame.cc:867-870) + memory-safety guards
    bounds_ok = (su_r0 + _L + _W + 1 < lw) & (su_r0 - _L - _W >= 0)
    safe = cand_ok & bounds_ok
    yc = jnp.clip(off + sv_l, _W, canvasL.shape[0] - _W - 1)
    xl = jnp.clip(su_l, _W, canvasL.shape[1] - _W - 1)
    xr = jnp.clip(su_r0, _W + _L, canvasR.shape[1] - _W - _L - 1)

    if use_pallas_sad:
        # fused VMEM window kernel (ops/stereo_pallas.py) — the vmapped
        # dynamic slices below lower to two 2000-iteration while loops on
        # TPU (~3.5 ms/frame); identical f32 integer arithmetic
        from .stereo_pallas import sad_windows_pallas

        dists = sad_windows_pallas(canvasL, canvasR, yc, xl, xr)
    else:
        def patchL(y, x):
            return jax.lax.dynamic_slice(
                canvasL, (y - _W, x - _W), (_WIN, _WIN)
            ).astype(jnp.float32)

        def stripR(y, x):
            return jax.lax.dynamic_slice(
                canvasR, (y - _W, x - _W - _L), (_WIN, _STRIP)
            ).astype(jnp.float32)

        IL = jax.vmap(patchL)(yc, xl)            # (N, 11, 11)
        IR = jax.vmap(stripR)(yc, xr)            # (N, 11, 21)
        IL = IL - IL[:, _W, _W][:, None, None]

        def sad_at(inc):
            win = jax.lax.dynamic_slice_in_dim(IR, inc, _WIN, axis=2)
            win = win - win[:, _W, _W + 0][:, None, None]
            return jnp.sum(jnp.abs(IL - win), axis=(1, 2))

        dists = jnp.stack(
            [sad_at(i) for i in range(2 * _L + 1)], axis=1
        )  # (N, 11)
    best_inc = jnp.argmin(dists, axis=1)
    interior = (best_inc > 0) & (best_inc < 2 * _L)
    bi = jnp.clip(best_inc, 1, 2 * _L - 1)
    d1 = jnp.take_along_axis(dists, bi[:, None] - 1, axis=1)[:, 0]
    d2 = jnp.take_along_axis(dists, bi[:, None], axis=1)[:, 0]
    d3 = jnp.take_along_axis(dists, bi[:, None] + 1, axis=1)[:, 0]
    denom = d1 + d3 - 2.0 * d2
    delta = (d1 - d3) / jnp.where(jnp.abs(denom) > 0, 2.0 * denom, 1.0)
    delta_ok = (delta >= -1.0) & (delta <= 1.0) & (jnp.abs(denom) > 0)

    best_ur = scale_factors[kpL_oct] * (
        su_r0.astype(jnp.float32) + (bi - _L).astype(jnp.float32) + delta
    )
    disparity = kpL_xy[:, 0] - best_ur
    disp_in_range = (disparity >= 0.0) & (disparity < max_d)
    clamp0 = disparity <= 0.0
    disparity = jnp.where(clamp0, 0.01, disparity)
    best_ur = jnp.where(clamp0, kpL_xy[:, 0] - 0.01, best_ur)

    ok = safe & interior & delta_ok & disp_in_range
    sad_best = d2

    # --- stage 3: median-SAD outlier cut (Frame.cc:918-931) ---------------
    sorted_sad = jnp.sort(jnp.where(ok, sad_best, jnp.inf))
    cnt = jnp.sum(ok.astype(jnp.int32))
    median = sorted_sad[jnp.clip(cnt // 2, 0, n - 1)]
    ok &= sad_best < 1.5 * 1.4 * median

    u_right = jnp.where(ok, best_ur, -1.0)
    depth = jnp.where(ok, bf / disparity, -1.0)
    return u_right, depth

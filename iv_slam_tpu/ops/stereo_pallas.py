"""Pallas SAD-window kernel for stereo sub-pixel refinement.

The XLA formulation of ComputeStereoMatches' stage 2 (Frame.cc:848-905)
extracts a per-keypoint 11x11 left patch and 11x21 right strip with vmapped
dynamic slices, which lower to two sequential 2000-iteration while loops on
TPU (~3.5 ms/frame measured on v5e — the hottest remaining frontend ops
after the selection rewrite). This kernel keeps both uint8 pyramid
canvases VMEM-resident and fetches each window as an aligned slab slice +
two rolls (the ops/finish_pallas.py pattern), emitting the 11 SAD values
per keypoint directly.

Exactness: pixels are uint8; diffs and SAD sums are integers < 2^24,
computed in f32 — bit-identical to the XLA path (asserted in
tests/test_stereo_pallas.py via the interpreter and on-device in
tests/test_fast_paths.py when a TPU is present).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK = 32        # keypoints per program
_W = 5         # SAD half-window
_L = 5         # slide half-range
_WIN = 2 * _W + 1       # 11
_STRIP = 2 * (_W + _L) + 1  # 21


def _to_f32(x):
    # Mosaic has no direct uint8 -> float32 cast; hop through int32
    if x.dtype == jnp.float32:
        return x
    return x.astype(jnp.int32).astype(jnp.float32)


def _sad_kernel(idx_ref, cl_ref, cr_ref, cmask_ref, rmask_ref, dists_ref,
                il_scr, ir_scr):
    for k in range(BK):
        yc = idx_ref[k, 0]
        xl = idx_ref[k, 1]
        xr = idx_ref[k, 2]
        # left 11x11 patch: aligned (24, 256) slab + two residual rolls
        y0 = yc - _W
        x0 = xl - _W
        yb = pl.multiple_of((y0 // 8) * 8, 8)
        xb = pl.multiple_of((x0 // 128) * 128, 128)
        slab = _to_f32(cl_ref[pl.ds(yb, 24), pl.ds(xb, 256)])
        slab = pltpu.roll(slab, 24 - (y0 - yb), axis=0)
        slab = pltpu.roll(slab, 256 - (x0 - xb), axis=1)
        il_scr[k] = slab[:_WIN, :_WIN]
        # right 11x21 strip
        x0r = xr - _W - _L
        xbr = pl.multiple_of((x0r // 128) * 128, 128)
        slab_r = _to_f32(cr_ref[pl.ds(yb, 24), pl.ds(xbr, 256)])
        slab_r = pltpu.roll(slab_r, 24 - (y0 - yb), axis=0)
        slab_r = pltpu.roll(slab_r, 256 - (x0r - xbr), axis=1)
        ir_scr[k] = slab_r[:_WIN, :_STRIP]

    il = il_scr[:]                                   # (BK, 11, 11)
    ir = ir_scr[:]                                   # (BK, 11, 21)
    # centers via masked reductions: slicing a single element produces a
    # vector layout with nonzero offsets that Mosaic cannot re-broadcast;
    # a keepdims reduce yields a cleanly broadcastable (BK, 1, 1)
    il_c = jnp.sum(
        jnp.sum(il * cmask_ref[:][None], axis=2, keepdims=True),
        axis=1, keepdims=True,
    )                                                # (BK, 1, 1)
    ilz = il - il_c
    for inc in range(2 * _L + 1):
        win = ir[:, :, inc:inc + _WIN]
        w_c = jnp.sum(
            jnp.sum(ir * rmask_ref[inc][None], axis=2, keepdims=True),
            axis=1, keepdims=True,
        )                                            # (BK, 1, 1)
        # 2D stores: Mosaic needs rank >= 2 values for vector layouts
        s2 = jnp.sum(
            jnp.sum(jnp.abs(ilz - win + w_c), axis=2, keepdims=True), axis=1
        )                                            # (BK, 1)
        dists_ref[:, inc:inc + 1] = s2


@functools.partial(jax.jit, static_argnames=("interpret",))
def sad_windows_pallas(
    canvas_l: jnp.ndarray,
    canvas_r: jnp.ndarray,
    yc: jnp.ndarray,
    xl: jnp.ndarray,
    xr: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-keypoint SAD slide over the right strip.

    canvas_l/canvas_r: (H, W) uint8 flattened pyramids; yc/xl/xr: (N,)
    int32 window centers, pre-clipped by the caller so the 11x11 patch at
    (yc, xl) and the 11x21 strip at (yc, xr) are in bounds. Returns
    (N, 11) float32 SAD distances, identical to the XLA dynamic-slice
    formulation.
    """
    h, w = canvas_l.shape
    wc = ((w + 127) // 128) * 128 + 256
    cl = jnp.pad(canvas_l, ((0, 24), (0, wc - w)))
    cr = jnp.pad(canvas_r, ((0, 24), (0, wc - w)))
    n = yc.shape[0]
    n_pad = -n % BK
    idx = jnp.stack([yc, xl, xr], axis=1).astype(jnp.int32)
    idx = jnp.pad(idx, ((0, n_pad), (0, 0)), constant_values=_W + _L)
    n_tot = n + n_pad
    import numpy as np

    cmask = np.zeros((_WIN, _WIN), np.float32)
    cmask[_W, _W] = 1.0
    rmask = np.zeros((2 * _L + 1, _WIN, _STRIP), np.float32)
    for inc in range(2 * _L + 1):
        rmask[inc, _W, _W + inc] = 1.0
    dists = pl.pallas_call(
        _sad_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tot, 2 * _L + 1), jnp.float32),
        grid=(n_tot // BK,),
        in_specs=[
            pl.BlockSpec((BK, 3), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BK, 2 * _L + 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BK, _WIN, _WIN), jnp.float32),
            pltpu.VMEM((BK, _WIN, _STRIP), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx, cl, cr, jnp.asarray(cmask), jnp.asarray(rmask))
    return dists[:n]

"""Fused IC-orientation + patch-gather Pallas kernel over the pyramid canvas.

Replaces the finishing stage of extraction (IC_Angle + the patch gather of
computeOrbDescriptor, ORBextractor.cc:78-148) for the canvas formulation.
The XLA path issues per-keypoint gathers (prefix-sum takes for orientation,
39x39 patch dynamic-slices for BRIEF) which pay a large fixed per-op cost
on TPU (~3-6 ms per gather set for 2-4k keypoints, measured on v5e). This
kernel keeps both canvases VMEM-resident and turns the per-keypoint patch
fetch into an aligned-window slice + two residual rotates (native vector
ops — the whole gather measures ~0.05 ms): it emits per-keypoint angles
and blurred 39x39 patches. The 512 rotated-pattern BRIEF lookups then run
OUTSIDE the kernel as XLA's batched one-hot einsum, which lowers to an
efficient MXU loop (Mosaic has no batched dot; issuing 4k small dots
in-kernel measured ~7 ms, the XLA einsum ~0.3 ms).

Bit-identical descriptors vs the XLA path (same pixels, same cvRound
rotation arithmetic, one-hot selection exact for uint8 pixels in bf16);
angles agree to float ulp (FMA contraction differs inside the kernel) and
are used consistently for the rotation. Asserted in
tests/test_finish_pallas.py via the interpreter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import brief, orient

BK = 32  # keypoints per program


@functools.lru_cache(maxsize=1)
def _moment_mats() -> tuple:
    wu, wv = orient.moment_weights()
    return wu.reshape(31, 31), wv.reshape(31, 31)


def _finish_kernel(yx_ref, raw_ref, blur_ref, wu_ref, wv_ref,
                   ang_ref, patch_ref, raw_scr):
    for k in range(BK):
        y = yx_ref[k, 0]
        x = yx_ref[k, 1]
        # Mosaic requires dynamic starts tile-aligned (8 sublanes / 128
        # lanes): slice an aligned (rows+8, 256) window, then rotate the
        # residual offsets (rotate needs 32-bit data).
        y0 = y - 15
        x0 = x - 15
        yb = pl.multiple_of((y0 // 8) * 8, 8)
        xb = pl.multiple_of((x0 // 128) * 128, 128)
        slab = raw_ref[pl.ds(yb, 40), pl.ds(xb, 256)].astype(jnp.int32)
        slab = pltpu.roll(slab, 40 - (y0 - yb), axis=0)
        rolled = pltpu.roll(slab, 256 - (x0 - xb), axis=1)
        raw_scr[k] = rolled[:31, :31].astype(jnp.bfloat16)
        y0b = y - 19
        x0b = x - 19
        ybb = pl.multiple_of((y0b // 8) * 8, 8)
        xbb = pl.multiple_of((x0b // 128) * 128, 128)
        slab_b = blur_ref[pl.ds(ybb, 48), pl.ds(xbb, 256)].astype(jnp.int32)
        slab_b = pltpu.roll(slab_b, 48 - (y0b - ybb), axis=0)
        rolled_b = pltpu.roll(slab_b, 256 - (x0b - xbb), axis=1)
        # uint8 pixel values are exact in bfloat16 (integers <= 256)
        patch_ref[k] = rolled_b[:39, :39].astype(jnp.bfloat16)

    # intensity-centroid moments (exact: bf16 holds uint8 exactly,
    # accumulation in f32; |m| <= 961*255*15 < 2^24)
    raw31 = raw_scr[:].astype(jnp.float32)                    # (BK, 31, 31)
    m10 = jnp.sum(
        jnp.sum(raw31 * wu_ref[:][None], axis=2, keepdims=True), axis=1
    )                                                          # (BK, 1)
    m01 = jnp.sum(
        jnp.sum(raw31 * wv_ref[:][None], axis=2, keepdims=True), axis=1
    )
    ang_ref[:] = orient.fast_atan2_deg(m01, m10)               # (BK, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def patches_angles_pallas(
    raw_canvas: jnp.ndarray,
    blur_canvas: jnp.ndarray,
    yx: jnp.ndarray,
    interpret: bool = False,
):
    """Angles + blurred 39x39 patches for keypoints on a pyramid canvas.

    raw_canvas/blur_canvas: (H, W) uint8 flattened pyramids (unblurred /
    7x7 sigma=2 blurred); yx: (N, 2) int32 canvas coords (>= 19 from every
    level border, as the extractor guarantees). Returns (angles_deg (N,)
    float32, patches (N, 39, 39) bfloat16).
    """
    h, w = raw_canvas.shape
    # pad so the aligned (40/48, 256) window reads stay in bounds: 16 extra
    # rows; columns to the 128-aligned window base + 256
    wc = ((w + 217 + 127) // 128) * 128
    raw_p = jnp.pad(raw_canvas, ((0, 16), (0, wc - w)))
    blur_p = jnp.pad(blur_canvas, ((0, 16), (0, wc - w)))
    n = yx.shape[0]
    n_pad = -n % BK
    yx_p = jnp.pad(yx, ((0, n_pad), (0, 0)), constant_values=19)
    n_tot = n + n_pad

    wu, wv = _moment_mats()
    ang, patches = pl.pallas_call(
        _finish_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_tot, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tot, 39, 39), jnp.bfloat16),
        ),
        grid=(n_tot // BK,),
        in_specs=[
            pl.BlockSpec((BK, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, 39, 39), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((BK, 31, 31), jnp.bfloat16),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(yx_p, raw_p, blur_p, jnp.asarray(wu), jnp.asarray(wv))
    return ang[:n, 0], patches[:n]


def orient_brief_pallas(
    raw_canvas: jnp.ndarray,
    blur_canvas: jnp.ndarray,
    yx: jnp.ndarray,
    interpret: bool = False,
):
    """Fused orientation + descriptors for keypoints on a pyramid canvas:
    Pallas patch-gather + XLA batched one-hot einsum (see module doc).
    Returns (angles_deg (N,) float32, desc (N, 32) uint8)."""
    ang, patches = patches_angles_pallas(
        raw_canvas, blur_canvas, yx, interpret=interpret
    )
    return ang, brief.descriptors_from_patches(patches, ang)

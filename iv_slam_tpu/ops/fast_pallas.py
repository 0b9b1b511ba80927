"""Pallas TPU kernel for FAST-9/16 corner scoring.

The XLA formulation (ops/fast.py) materializes a (16, H, W) int16 stack of
shifted images plus several reduction temporaries — ~40 HBM-sized arrays of
traffic per level. This kernel computes the full corner score for a tile
entirely in VMEM: each program DMAs its (TILE+6)^2 halo block from HBM
once, the 16 ring samples are VMEM-local static slices, and the circular
9-window min/max reduction runs on the VPU without touching HBM. One
output write per pixel.

Used on TPU backends; ops/fast.py remains the reference/CPU path —
bit-identical results (asserted in tests/test_fast_pallas.py via the
interpreter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE

TILE_H = 128
TILE_W = 256
HALO = 3
# DMA block shapes must respect VMEM tiling (int32: 8x128 sublane/lane);
# arithmetic is int32 — Mosaic does not legalize 16-bit integer min/max
# round the halo block up and over-pad the input accordingly
BLOCK_H = TILE_H + 16
BLOCK_W = TILE_W + 128


def _fast_score_kernel(img_hbm, out_ref, scratch, sem, *, threshold: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        img_hbm.at[
            pl.ds(i * TILE_H, BLOCK_H),
            pl.ds(j * TILE_W, BLOCK_W),
        ],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    center = scratch[HALO:HALO + TILE_H, HALO:HALO + TILE_W]
    diffs = []
    for dy, dx in CIRCLE:
        s = scratch[
            HALO + dy:HALO + dy + TILE_H, HALO + dx:HALO + dx + TILE_W
        ]
        diffs.append(s - center)

    def min9(ds):
        m1 = [jnp.minimum(ds[k], ds[(k + 1) % 16]) for k in range(16)]
        m2 = [jnp.minimum(m1[k], m1[(k + 2) % 16]) for k in range(16)]
        m4 = [jnp.minimum(m2[k], m2[(k + 4) % 16]) for k in range(16)]
        return [jnp.minimum(m4[k], ds[(k + 8) % 16]) for k in range(16)]

    bright = min9(diffs)
    dark = min9([-d for d in diffs])
    bscore = bright[0]
    dscore = dark[0]
    for k in range(1, 16):
        bscore = jnp.maximum(bscore, bright[k])
        dscore = jnp.maximum(dscore, dark[k])
    score = jnp.maximum(bscore, dscore) - 1
    out_ref[:, :] = jnp.where(score >= threshold, score, 0)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_pallas(
    img: jnp.ndarray, threshold: int, interpret: bool = False
) -> jnp.ndarray:
    """(H, W) uint8 -> (H, W) int16 FAST corner score map (no NMS).
    Matches ops/fast.py fast_score bit-for-bit."""
    h, w = img.shape
    ph = -h % TILE_H
    pw = -w % TILE_W
    # over-pad so every (BLOCK_H, BLOCK_W) halo block stays in bounds
    x = jnp.pad(
        img.astype(jnp.int32),
        ((HALO, BLOCK_H - TILE_H - HALO + ph), (HALO, BLOCK_W - TILE_W - HALO + pw)),
    )

    grid = ((h + ph) // TILE_H, (w + pw) // TILE_W)
    out = pl.pallas_call(
        functools.partial(_fast_score_kernel, threshold=threshold),
        out_shape=jax.ShapeDtypeStruct((h + ph, w + pw), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_H, BLOCK_W), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # XLA stages the whole padded input/output for this call; the
            # default 16M scoped budget is too tight at KITTI level 0
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x)
    out = out[:h, :w].astype(jnp.int16)

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= HALO) & (yy < h - HALO) & (xx >= HALO) & (xx < w - HALO)
    return jnp.where(interior, out, 0)

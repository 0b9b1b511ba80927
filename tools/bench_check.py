"""Sanity-check timing methodology on the tunneled TPU: identical vs
varying inputs, queued-async vs per-call blocking."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")

    from iv_slam_tpu.config import ORBConfig
    from iv_slam_tpu.ops import pyramid as pyr
    from iv_slam_tpu.ops.extractor import (
        _fast_score, _select_level_keypoints, make_layouts,
    )

    H, W = 376, 1241
    cfg = ORBConfig(n_features=2000, n_levels=8, ini_th_fast=20, min_th_fast=7)
    layouts = make_layouts(cfg, H, W)
    shapes = [(l.h, l.w) for l in layouts]
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.integers(0, 255, size=(H, W)).astype(np.uint8))
            for _ in range(10)]
    imgs = jax.block_until_ready(imgs)

    def sel_none(a):
        levels = pyr.build_pyramid(a, shapes)
        out = []
        for i, lay in enumerate(layouts):
            if not lay.active:
                continue
            sm = _fast_score(levels[i], 7)
            out.append(_select_level_keypoints(sm, None, lay, 20))
        return out

    def sel_vmap2(a, b):
        pa = pyr.build_pyramid(a, shapes)
        pb = pyr.build_pyramid(b, shapes)
        out = []
        for i, lay in enumerate(layouts):
            if not lay.active:
                continue
            sm = jnp.stack([_fast_score(pa[i], 7), _fast_score(pb[i], 7)])
            out.append(jax.vmap(
                lambda s: _select_level_keypoints(s, None, lay, 20))(sm))
        return out

    def sel_loop2(a, b):
        return sel_none(a), sel_none(b)

    jf = jax.jit(sel_none)
    jv = jax.jit(sel_vmap2)
    jl = jax.jit(sel_loop2)

    # warmup
    jax.block_until_ready(jf(imgs[0]))
    jax.block_until_ready(jv(imgs[0], imgs[1]))
    jax.block_until_ready(jl(imgs[0], imgs[1]))

    # queued-async, identical input
    for label, fn, nargs in (("single", jf, 1), ("vmap2", jv, 2), ("loop2", jl, 2)):
        t0 = time.perf_counter()
        outs = [fn(*imgs[:nargs]) for _ in range(10)]
        jax.block_until_ready(outs[-1])
        same = (time.perf_counter() - t0) / 10 * 1e3

        t0 = time.perf_counter()
        outs = [fn(*((imgs[(k + j) % 10],) * nargs)) for j, k in enumerate(range(10))]
        jax.block_until_ready(outs[-1])
        vary = (time.perf_counter() - t0) / 10 * 1e3

        # per-call blocking, varying input
        ts = []
        for j in range(6):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*((imgs[j % 10],) * nargs)))
            ts.append((time.perf_counter() - t0) * 1e3)
        blk = float(np.median(ts))
        print(f"{label:8s} queued-same {same:7.2f}  queued-vary {vary:7.2f}  "
              f"blocked-median {blk:7.2f} ms")


if __name__ == "__main__":
    main()

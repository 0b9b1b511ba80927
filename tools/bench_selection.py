"""Microbenchmark of the pieces inside _select_level_keypoints."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, reps=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")

    from iv_slam_tpu.config import CameraConfig, Config, ORBConfig
    from iv_slam_tpu.ops import pyramid as pyr
    from iv_slam_tpu.ops.extractor import (
        _fast_score, _redistribute, _tile_nms, _tile_view, make_layouts,
    )

    H, W = 376, 1241
    cfg = ORBConfig(n_features=2000, n_levels=8, ini_th_fast=20, min_th_fast=7)
    layouts = make_layouts(cfg, H, W)
    shapes = [(l.h, l.w) for l in layouts]

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, size=(H, W)).astype(np.uint8))

    levels = jax.jit(lambda a: pyr.build_pyramid(a, shapes))(img)
    levels = jax.block_until_ready(levels)
    scores = [jax.jit(lambda l: _fast_score(l, 7))(levels[i])
              for i, l in enumerate(range(len(layouts)))]
    scores = [jax.jit(lambda l: _fast_score(l, 7))(levels[i])
              for i in range(len(layouts))]
    scores = jax.block_until_ready(scores)

    for i, lay in enumerate(layouts):
        print(f"level {i}: {lay.h}x{lay.w} cells={lay.level_rows}x{lay.level_cols}"
              f" cell={lay.cell_h}x{lay.cell_w} nd={lay.n_desired} top_k={lay.top_k}")

    def all_levels(fn):
        def run(ss):
            return [fn(ss[i], layouts[i]) for i in range(len(layouts))
                    if layouts[i].active]
        return jax.jit(run)

    print("tile_view      ", timed(all_levels(lambda s, l: _tile_view(s, l)), (scores,)))
    print("tile_view+nms  ", timed(all_levels(lambda s, l: _tile_nms(_tile_view(s, l))), (scores,)))

    def upto_topk(s, lay):
        tiles = _tile_nms(_tile_view(s, lay))
        flat = jnp.where(tiles > 0, tiles.astype(jnp.float32), -jnp.inf).reshape(lay.n_cells, -1)
        vals, idxs = jax.lax.top_k(flat, lay.top_k)
        return vals, idxs

    print("+cell top_k    ", timed(all_levels(upto_topk), (scores,)))

    def upto_scan(s, lay):
        tiles = _tile_nms(_tile_view(s, lay))
        detected = tiles > 0
        n_total = jnp.sum(detected.astype(jnp.int32), axis=(1, 2))
        budgets = jnp.full((lay.n_cells,), max(1, lay.n_desired // lay.n_cells), jnp.int32)
        return _redistribute(n_total, budgets, lay.n_cells)

    print("nms+scan       ", timed(all_levels(upto_scan), (scores,)))

    def gtop(s, lay):
        tiles = _tile_nms(_tile_view(s, lay))
        flat = jnp.where(tiles > 0, tiles.astype(jnp.float32), -jnp.inf).reshape(lay.n_cells, -1)
        vals, idxs = jax.lax.top_k(flat, lay.top_k)
        gvals = vals.reshape(-1)
        return jax.lax.top_k(gvals, lay.n_desired)

    print("+global top_k  ", timed(all_levels(gtop), (scores,)))


if __name__ == "__main__":
    main()


def extra():
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
    img = jnp.asarray(rng.integers(0, 255, size=(H, W)).astype(np.uint8))

    def sel_zeros(a):
        levels = pyr.build_pyramid(a, shapes)
        out = []
        for i, lay in enumerate(layouts):
            if not lay.active:
                continue
            sm = _fast_score(levels[i], 7)
            out.append(_select_level_keypoints(sm, jnp.zeros_like(levels[i]), lay, 20))
        return out

    def sel_none(a):
        levels = pyr.build_pyramid(a, shapes)
        out = []
        for i, lay in enumerate(layouts):
            if not lay.active:
                continue
            sm = _fast_score(levels[i], 7)
            out.append(_select_level_keypoints(sm, None, lay, 20))
        return out

    print("pyr+FAST+sel[qual=zeros]", timed(jax.jit(sel_zeros), (img,)))
    print("pyr+FAST+sel[qual=None] ", timed(jax.jit(sel_none), (img,)))


if __name__ == "__main__" and "--extra" in sys.argv:
    extra()

"""Compare IC-orientation implementations on the current backend."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, argsets, reps=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*argsets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*argsets[i % len(argsets)]) for i in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")

    from iv_slam_tpu.config import ORBConfig
    from iv_slam_tpu.ops import orient
    from iv_slam_tpu.ops import pyramid as pyr
    from iv_slam_tpu.ops.extractor import make_layouts

    H, W = 376, 1241
    cfg = ORBConfig(n_features=2000, n_levels=8, ini_th_fast=20, min_th_fast=7)
    layouts = make_layouts(cfg, H, W)
    shapes = [(l.h, l.w) for l in layouts]
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.integers(0, 255, size=(H, W)).astype(np.uint8))
            for _ in range(4)]
    imgs = jax.block_until_ready(imgs)

    # fixed keypoints per level (representative counts)
    yx = []
    for lay in layouts:
        n = lay.n_desired
        ys = rng.integers(20, lay.h - 20, size=n).astype(np.int32)
        xs = rng.integers(20, lay.w - 20, size=n).astype(np.int32)
        yx.append(jnp.asarray(np.stack([ys, xs], axis=1)))

    def chain(fn):
        def run(a):
            levels = pyr.build_pyramid(a, shapes)
            return [fn(levels[i], yx[i]) for i in range(len(layouts))
                    if layouts[i].active]
        return jax.jit(run)

    argsets = [(im,) for im in imgs]
    for name, fn in (
        ("integral (current)", orient.ic_angles_integral),
        ("patch 31x31 matmul", orient.ic_angles),
        ("conv moments", orient.ic_angles_conv),
    ):
        try:
            ms = timed(chain(fn), argsets)
            # verify agreement vs integral
            ref = chain(orient.ic_angles_integral)(imgs[0])
            got = chain(fn)(imgs[0])
            err = max(float(jnp.max(jnp.abs(r - g))) for r, g in zip(ref, got))
            print(f"{name:24s} {ms:7.2f} ms   max|diff|={err:.2e}")
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

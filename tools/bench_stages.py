"""Per-stage device-time microbenchmark of the stereo frontend.

Times each device stage of the frontend program separately (pyramid, FAST,
selection, orientation, blur, BRIEF variants, stereo matching) plus the
whole fused step, on whatever backend jax sees. To factor out the
high-latency dev link, each stage is dispatched `reps` times back-to-back
and blocked once: queued dispatches overlap the link RTT, so
total/reps ~= device compute per call + dispatch overhead.

Usage: python tools/bench_stages.py [--reps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, reps: int, warmup: int = 2) -> float:
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / reps
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--features", type=int, default=2000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")

    from iv_slam_tpu.config import CameraConfig, Config, ORBConfig
    from iv_slam_tpu.ops import brief, image, orient
    from iv_slam_tpu.ops import pyramid as pyr
    from iv_slam_tpu.ops import stereo
    from iv_slam_tpu.ops.extractor import OrbExtractor, _fast_score, _select_level_keypoints
    from iv_slam_tpu.slam.frame import StereoFrontend

    H, W = args.height, args.width
    cfg = Config()
    cfg.camera = CameraConfig(width=W, height=H)
    cfg.orb = ORBConfig(n_features=args.features, n_levels=8,
                        ini_th_fast=20, min_th_fast=7)

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(H, W + 64)).astype(np.float32)
    try:
        import cv2

        base = cv2.GaussianBlur(base, (5, 5), 1.2)
        for _ in range(300):
            y, x = rng.integers(10, H - 16), rng.integers(10, W + 40)
            base[y:y + 8, x:x + 8] = rng.uniform(0, 255)
    except ImportError:
        pass
    left = np.clip(base[:, 32:32 + W], 0, 255).astype(np.uint8)
    right = np.clip(base[:, 12:12 + W], 0, 255).astype(np.uint8)

    fe = StereoFrontend(cfg, H, W)
    ex: OrbExtractor = fe.extractor
    il = jnp.asarray(left)
    ir = jnp.asarray(right)
    reps = args.reps

    print(f"backend={jax.default_backend()} reps={reps} HxW={H}x{W} "
          f"features={args.features}")

    rows = []

    # full fused frontend step (the bench.py program)
    rows.append(("full fused step", timed(fe._jit_plain, (il, ir), reps)))

    # pyramid (both images)
    f_pyr = jax.jit(lambda a, b: (pyr.build_pyramid(a, ex.shapes),
                                  pyr.build_pyramid(b, ex.shapes)))
    rows.append(("pyramids L+R", timed(f_pyr, (il, ir), reps)))

    pl_, pr_ = f_pyr(il, ir)
    pl_ = jax.block_until_ready(pl_)

    # FAST scoring on all levels, both images
    def f_fast(levels):
        return [_fast_score(l, cfg.orb.min_th_fast) for l in levels]
    f_fast_j = jax.jit(lambda a, b: (f_fast(pyr.build_pyramid(a, ex.shapes)),
                                     f_fast(pyr.build_pyramid(b, ex.shapes))))
    rows.append(("pyr + FAST L+R", timed(f_fast_j, (il, ir), reps)))

    # selection given score maps (batched L/R as in the fused step)
    def f_sel(a, b):
        outs = []
        for lvl, lay in enumerate(ex.layouts):
            if not lay.active:
                continue
            pa = pyr.build_pyramid(a, ex.shapes)[lvl]
            pb = pyr.build_pyramid(b, ex.shapes)[lvl]
            sm = jnp.stack([_fast_score(pa, cfg.orb.min_th_fast),
                            _fast_score(pb, cfg.orb.min_th_fast)])
            q = jnp.zeros_like(sm)
            outs.append(jax.vmap(
                lambda s, qq: _select_level_keypoints(s, qq, lay,
                                                      cfg.orb.ini_th_fast)
            )(sm, q))
        return outs
    rows.append(("pyr + FAST + selection L+R", timed(jax.jit(f_sel), (il, ir), reps)))

    # orientation + blur + BRIEF on fixed keypoints, per level, both images
    kb = fe._jit_plain(il, ir)
    kl = kb[0]
    yx_host = np.asarray(kl.yx_level)
    oct_host = np.asarray(kl.octave)

    lvl_yx = []
    for lvl, lay in enumerate(ex.layouts):
        sel = oct_host == lvl
        yx = yx_host[sel]
        if yx.size == 0:
            yx = np.full((1, 2), 32, np.int32)
        lvl_yx.append(jnp.asarray(yx))

    def f_orient(a):
        levels = pyr.build_pyramid(a, ex.shapes)
        return [orient.ic_angles_integral(levels[l], lvl_yx[l])
                for l in range(len(ex.layouts)) if ex.layouts[l].active]
    rows.append(("pyr + orientation L", timed(jax.jit(f_orient), (il,), reps)))

    def f_blur(a):
        levels = pyr.build_pyramid(a, ex.shapes)
        return [image.gaussian_blur(levels[l], 7, 2.0)
                for l in range(len(ex.layouts)) if ex.layouts[l].active]
    rows.append(("pyr + blur L", timed(jax.jit(f_blur), (il,), reps)))

    for name, fn in (("onehot", brief.descriptors_onehot_mxu),
                     ("flat", brief.descriptors_global_gather),
                     ("patch", brief.descriptors)):
        def f_desc(a, fn=fn):
            levels = pyr.build_pyramid(a, ex.shapes)
            out = []
            for l in range(len(ex.layouts)):
                if not ex.layouts[l].active:
                    continue
                blurred = image.gaussian_blur(levels[l], 7, 2.0)
                ang = orient.ic_angles_integral(levels[l], lvl_yx[l])
                out.append(fn(blurred, lvl_yx[l], ang))
            return out
        rows.append((f"pyr + blur + orient + BRIEF[{name}] L",
                     timed(jax.jit(f_desc), (il,), reps)))

    # stereo matching given both extractions
    kr = kb[1]
    def f_stereo(a, b):
        pa = pyr.build_pyramid(a, ex.shapes)
        pb = pyr.build_pyramid(b, ex.shapes)
        ca, _ = stereo.flatten_pyramid(pa)
        cb, _ = stereo.flatten_pyramid(pb)
        return stereo.match_stereo(
            kl.xy, kl.octave, kl.desc, kl.valid,
            kr.xy, kr.octave, kr.desc, kr.valid,
            ca, cb, fe.level_offsets, fe.level_widths,
            fe.scale_factors, jnp.float32(cfg.camera.bf),
            jnp.float32(cfg.camera.baseline),
        )
    rows.append(("pyr + stereo match", timed(jax.jit(f_stereo), (il, ir), reps)))

    w = max(len(r[0]) for r in rows)
    for name, ms in rows:
        print(f"  {name:<{w}}  {ms:7.2f} ms")


if __name__ == "__main__":
    main()

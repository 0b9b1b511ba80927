"""Raw per-op costs: patch extraction, flat gathers, one-hot matmuls."""

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

    from iv_slam_tpu.ops import orient

    H, W = 376, 1241
    N = 2000
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.integers(0, 255, size=(H, W)).astype(np.uint8))
            for _ in range(4)]
    ys = rng.integers(25, H - 25, size=N).astype(np.int32)
    xs = rng.integers(25, W - 25, size=N).astype(np.int32)
    yx = jnp.asarray(np.stack([ys, xs], axis=1))
    jax.block_until_ready(imgs)

    argsets = [(im,) for im in imgs]

    rows = []

    for r, label in ((15, "patch31"), (19, "patch39")):
        f = jax.jit(lambda a, r=r: orient.extract_patches(a, yx, r))
        rows.append((f"extract_patches {label} (dyn-slice vmap)", timed(f, argsets)))

    # flat random gather of K elements per keypoint
    for K in (31, 62, 512):
        idx = jnp.asarray(
            (rng.integers(25, H - 25, size=(N, K)) * W
             + rng.integers(25, W - 25, size=(N, K))).astype(np.int32))
        f = jax.jit(lambda a, idx=idx: jnp.take(a.reshape(-1), idx))
        rows.append((f"flat gather ({N},{K})", timed(f, argsets)))

    # row gather: take of 31 full rows per keypoint
    rowidx = jnp.asarray((ys[:, None] + np.arange(-15, 16)[None, :]).astype(np.int32))

    # one-hot einsum as in BRIEF onehot (patches precomputed inside)
    def onehot_chain(a):
        patches = orient.extract_patches(a, yx, 19)
        rowsi = jnp.asarray(rng.integers(0, 39, size=(N, 512)).astype(np.int32))
        colsi = jnp.asarray(rng.integers(0, 39, size=(N, 512)).astype(np.int32))
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 39), 2)
        oh_r = (rowsi[:, :, None] == iota).astype(jnp.bfloat16)
        oh_c = (colsi[:, :, None] == iota).astype(jnp.float32)
        sel = jnp.einsum("nsr,nrc->nsc", oh_r, patches.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return jnp.sum(sel * oh_c, axis=-1)

    rows.append(("patch39 + onehot einsum", timed(jax.jit(onehot_chain), argsets)))

    # cumsum pair over the image (the integral-orientation fixed cost)
    def cumsums(a):
        i32 = a.astype(jnp.int32)
        S = jnp.cumsum(i32, axis=1)
        Wm = jnp.cumsum(i32 * jnp.arange(W, dtype=jnp.int32)[None, :], axis=1)
        return S, Wm

    rows.append(("cumsum S+W (level0 only)", timed(jax.jit(cumsums), argsets)))

    # integral-orientation minus cumsums: the (N,31)x2 take
    def take_part(a):
        S, Wm = cumsums(a)
        Sf, Wf = S.reshape(-1), Wm.reshape(-1)
        flat = jnp.asarray(rng.integers(0, H * W, size=(N, 31)).astype(np.int32))
        return jnp.take(Sf, flat), jnp.take(Wf, flat)

    rows.append(("cumsums + 2x (N,31) take", timed(jax.jit(take_part), argsets)))

    w = max(len(r[0]) for r in rows)
    for name, ms in rows:
        print(f"  {name:<{w}}  {ms:7.2f} ms")


if __name__ == "__main__":
    main()

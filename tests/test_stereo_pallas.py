"""Pallas SAD-window kernel (ops/stereo_pallas.py) vs the XLA formulation.

Interpreter-mode check that the fused VMEM kernel emits bit-identical SAD
distances to the dynamic-slice path of ops/stereo.py stage 2.
"""

import numpy as np
import jax
import jax.numpy as jnp

from iv_slam_tpu.ops import stereo
from iv_slam_tpu.ops.stereo_pallas import sad_windows_pallas, _W, _L, _WIN, _STRIP


def _xla_dists(canvasL, canvasR, yc, xl, xr):
    def patchL(y, x):
        return jax.lax.dynamic_slice(
            canvasL, (y - _W, x - _W), (_WIN, _WIN)
        ).astype(jnp.float32)

    def stripR(y, x):
        return jax.lax.dynamic_slice(
            canvasR, (y - _W, x - _W - _L), (_WIN, _STRIP)
        ).astype(jnp.float32)

    IL = jax.vmap(patchL)(yc, xl)
    IR = jax.vmap(stripR)(yc, xr)
    IL = IL - IL[:, _W, _W][:, None, None]

    def sad_at(inc):
        win = jax.lax.dynamic_slice_in_dim(IR, inc, _WIN, axis=2)
        win = win - win[:, _W, _W][:, None, None]
        return jnp.sum(jnp.abs(IL - win), axis=(1, 2))

    return jnp.stack([sad_at(i) for i in range(2 * _L + 1)], axis=1)


def test_sad_kernel_matches_xla_uint8():
    rng = np.random.default_rng(0)
    H, W = 96, 200
    cl = rng.integers(0, 255, (H, W)).astype(np.uint8)
    cr = rng.integers(0, 255, (H, W)).astype(np.uint8)
    n = 70  # not a multiple of the kernel block size
    yc = rng.integers(_W, H - _W - 1, n).astype(np.int32)
    xl = rng.integers(_W, W - _W - 1, n).astype(np.int32)
    xr = rng.integers(_W + _L, W - _W - _L - 1, n).astype(np.int32)
    ref = np.asarray(_xla_dists(jnp.asarray(cl), jnp.asarray(cr),
                                jnp.asarray(yc), jnp.asarray(xl),
                                jnp.asarray(xr)))
    got = np.asarray(sad_windows_pallas(
        jnp.asarray(cl), jnp.asarray(cr), jnp.asarray(yc), jnp.asarray(xl),
        jnp.asarray(xr), interpret=True,
    ))
    assert got.shape == (n, 2 * _L + 1)
    assert np.array_equal(ref, got)


def test_sad_kernel_edge_positions():
    """Window centers at the exact clip limits (the clamps match_stereo
    applies) stay in bounds and agree with XLA."""
    rng = np.random.default_rng(1)
    H, W = 64, 160
    cl = rng.integers(0, 255, (H, W)).astype(np.uint8)
    cr = rng.integers(0, 255, (H, W)).astype(np.uint8)
    yc = np.array([_W, H - _W - 1, _W, H - _W - 1], np.int32)
    xl = np.array([_W, W - _W - 1, W - _W - 1, _W], np.int32)
    xr = np.array([_W + _L, W - _W - _L - 1, _W + _L, W - _W - _L - 1],
                  np.int32)
    ref = np.asarray(_xla_dists(jnp.asarray(cl), jnp.asarray(cr),
                                jnp.asarray(yc), jnp.asarray(xl),
                                jnp.asarray(xr)))
    got = np.asarray(sad_windows_pallas(
        jnp.asarray(cl), jnp.asarray(cr), jnp.asarray(yc), jnp.asarray(xl),
        jnp.asarray(xr), interpret=True,
    ))
    assert np.array_equal(ref, got)


def test_match_stereo_flag_cpu_equivalence():
    """match_stereo(use_pallas_sad=True) == (False) under the interpreter
    is covered above; on CPU the flag must simply be ignored upstream —
    assert the frontend still produces matches with the default config."""
    from iv_slam_tpu.config import Config, CameraConfig, ORBConfig
    from iv_slam_tpu.slam.frame import StereoFrontend
    from synth_world import PlaneWorld, camera_pose

    rng = np.random.default_rng(3)
    world = PlaneWorld(rng)
    cfg = Config()
    cfg.camera = CameraConfig(fx=400.0, fy=400.0, cx=160.0, cy=120.0,
                              bf=world.bf, width=world.w, height=world.h)
    cfg.orb = ORBConfig(n_features=400, n_levels=4, max_keypoints=1024)
    fe = StereoFrontend(cfg, world.h, world.w)
    left, right = world.render_stereo(camera_pose((0, 0), height=10.0))
    fr = fe.process(left, right, 0.0)
    assert (fr.depth > 0).sum() > 50

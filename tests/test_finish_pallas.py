"""Fused finishing kernel (ops/finish_pallas.py) vs the XLA canvas path.

The kernel replaces IC_Angle + the BRIEF patch gather
(ORBextractor.cc:78-148) on the flattened pyramid canvas; the tests run it
through the Pallas interpreter on the CPU mesh and require bit-identical
descriptors / ulp-level angles against orient.ic_angles_integral +
brief.descriptors_onehot_mxu on the same pixels.
"""

import numpy as np
import jax.numpy as jnp

from iv_slam_tpu.ops import brief, finish_pallas, orient


def _canvas(rng, h, w):
    raw = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    blur = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    return jnp.asarray(raw), jnp.asarray(blur), raw, blur


def test_patches_and_angles_match_xla(rng):
    h, w = 120, 333  # deliberately non-128-aligned width
    raw_j, blur_j, raw, blur = _canvas(rng, h, w)
    n = 77  # exercises BK padding (77 % 32 != 0)
    ys = rng.integers(19, h - 19, size=n).astype(np.int32)
    xs = rng.integers(19, w - 19, size=n).astype(np.int32)
    yx = jnp.asarray(np.stack([ys, xs], axis=1))

    ang, patches = finish_pallas.patches_angles_pallas(
        raw_j, blur_j, yx, interpret=True
    )
    assert ang.shape == (n,) and patches.shape == (n, 39, 39)

    # patch gather: exact pixels from the blurred canvas
    ref_patches = np.stack(
        [blur[y - 19:y + 20, x - 19:x + 20] for y, x in zip(ys, xs)]
    )
    np.testing.assert_array_equal(
        np.asarray(patches, dtype=np.float32), ref_patches.astype(np.float32)
    )

    # angles: same moments, f32 accumulation (FMA contraction may differ)
    ang_ref = orient.ic_angles_integral(raw_j, yx)
    np.testing.assert_allclose(
        np.asarray(ang), np.asarray(ang_ref), atol=5e-3
    )


def test_descriptors_bit_identical(rng):
    h, w = 96, 256
    raw_j, blur_j, _, _ = _canvas(rng, h, w)
    n = 64
    ys = rng.integers(19, h - 19, size=n).astype(np.int32)
    xs = rng.integers(19, w - 19, size=n).astype(np.int32)
    yx = jnp.asarray(np.stack([ys, xs], axis=1))

    ang, desc = finish_pallas.orient_brief_pallas(
        raw_j, blur_j, yx, interpret=True
    )
    # identical angles -> descriptors must be bit-identical to the
    # canvas-gather one-hot path on the same pixels
    desc_ref = brief.descriptors_onehot_mxu(blur_j, yx, ang)
    np.testing.assert_array_equal(np.asarray(desc), np.asarray(desc_ref))


def test_descriptors_from_patches_equals_onehot(rng):
    """The factored-out lookup (descriptors_from_patches) equals the fused
    gather+lookup for XLA-gathered patches at arbitrary angles."""
    h, w = 80, 200
    _, blur_j, blur, _ = _canvas(rng, h, w)
    n = 40
    ys = rng.integers(19, h - 19, size=n).astype(np.int32)
    xs = rng.integers(19, w - 19, size=n).astype(np.int32)
    yx = jnp.asarray(np.stack([ys, xs], axis=1))
    ang = jnp.asarray(rng.uniform(-180, 180, size=n).astype(np.float32))

    patches = jnp.stack(
        [blur_j[y - 19:y + 20, x - 19:x + 20] for y, x in zip(ys, xs)]
    ).astype(jnp.bfloat16)
    d1 = brief.descriptors_from_patches(patches, ang)
    d2 = brief.descriptors_onehot_mxu(blur_j, yx, ang)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

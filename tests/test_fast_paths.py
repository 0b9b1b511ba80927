"""Equality of the TPU-optimized formulations vs the direct ones."""

import cv2
import numpy as np
import jax.numpy as jnp

from iv_slam_tpu.ops import brief, image, orient


def _img(rng, h=160, w=200):
    im = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    im = cv2.GaussianBlur(im, (5, 5), 1.2)
    return np.clip(im, 0, 255).astype(np.uint8)


def test_conv_ic_angles_match_patch_version(rng):
    img = _img(rng)
    ys = rng.integers(19, img.shape[0] - 19, 64)
    xs = rng.integers(19, img.shape[1] - 19, 64)
    yx = jnp.asarray(np.stack([ys, xs], 1).astype(np.int32))
    a1 = np.asarray(orient.ic_angles(jnp.asarray(img), yx))
    a2 = np.asarray(orient.ic_angles_conv(jnp.asarray(img), yx))
    d = np.abs(a1 - a2)
    d = np.minimum(d, 360 - d)
    assert d.max() < 1e-2, d.max()


def test_global_gather_brief_matches_patch_version(rng):
    img = _img(rng)
    blurred = np.asarray(image.gaussian_blur(jnp.asarray(img), 7, 2.0))
    ys = rng.integers(19, img.shape[0] - 19, 48)
    xs = rng.integers(19, img.shape[1] - 19, 48)
    yx = jnp.asarray(np.stack([ys, xs], 1).astype(np.int32))
    ang = jnp.asarray(rng.uniform(0, 360, 48).astype(np.float32))
    d1 = np.asarray(brief.descriptors(jnp.asarray(blurred), yx, ang))
    d2 = np.asarray(
        brief.descriptors_global_gather(jnp.asarray(blurred), yx, ang)
    )
    np.testing.assert_array_equal(d1, d2)


def test_onehot_mxu_brief_bit_identical(rng):
    img = _img(rng)
    blurred = np.asarray(image.gaussian_blur(jnp.asarray(img), 7, 2.0))
    ys = rng.integers(19, img.shape[0] - 19, 48)
    xs = rng.integers(19, img.shape[1] - 19, 48)
    yx = jnp.asarray(np.stack([ys, xs], 1).astype(np.int32))
    ang = jnp.asarray(rng.uniform(0, 360, 48).astype(np.float32))
    d1 = np.asarray(brief.descriptors(jnp.asarray(blurred), yx, ang))
    d2 = np.asarray(
        brief.descriptors_onehot_mxu(jnp.asarray(blurred), yx, ang)
    )
    np.testing.assert_array_equal(d1, d2)

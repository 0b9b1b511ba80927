import cv2
import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.smoke

from iv_slam_tpu.ops import image


def _test_img(rng, h=96, w=128):
    # smooth random image (realistic gradients, not white noise)
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (9, 9), 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_resize_matches_cv2(rng):
    img = _test_img(rng)
    for scale in (1 / 1.2, 1 / 1.44, 0.5):
        oh, ow = int(round(img.shape[0] * scale)), int(round(img.shape[1] * scale))
        ours = np.asarray(image.resize_bilinear(jnp.asarray(img), oh, ow))
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # OpenCV's 8U path uses 11-bit fixed-point coefficients; the float
        # path lands within 1 LSB everywhere (below sensor noise)
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.2


def test_resize_float_exact(rng):
    img = _test_img(rng).astype(np.float32)
    oh, ow = 80, 107
    ours = np.asarray(image.resize_bilinear(jnp.asarray(img), oh, ow))
    ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_reflect101_pad_matches_cv2(rng):
    img = _test_img(rng, 32, 40)
    ours = np.asarray(image.reflect101_pad(jnp.asarray(img), 19))
    ref = cv2.copyMakeBorder(img, 19, 19, 19, 19, cv2.BORDER_REFLECT_101)
    np.testing.assert_array_equal(ours, ref)


def test_gaussian_blur_matches_cv2(rng):
    img = _test_img(rng)
    ours = np.asarray(image.gaussian_blur(jnp.asarray(img), 7, 2.0))
    ref = cv2.GaussianBlur(img, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.05


def test_gaussian_blur_float(rng):
    img = _test_img(rng).astype(np.float32)
    ours = np.asarray(image.gaussian_blur(jnp.asarray(img), 7, 2.0))
    ref = cv2.GaussianBlur(img, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(ours, ref, atol=1e-2)

import cv2
import numpy as np
import jax.numpy as jnp

from iv_slam_tpu.ops import fast, fast_pallas


def test_pallas_fast_matches_xla_reference(rng):
    img = rng.uniform(0, 255, size=(240, 320)).astype(np.float32)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    for _ in range(60):
        y, x = rng.integers(10, 220), rng.integers(10, 300)
        img[y:y + 6, x:x + 6] = rng.uniform(0, 255)
    img = np.clip(img, 0, 255).astype(np.uint8)

    ref = np.asarray(fast.fast_score(jnp.asarray(img), 12))
    ours = np.asarray(
        fast_pallas.fast_score_pallas(jnp.asarray(img), 12, interpret=True)
    )
    np.testing.assert_array_equal(ours, ref)


def test_pallas_fast_nonaligned_size(rng):
    img = (rng.uniform(0, 255, size=(100, 150))).astype(np.uint8)
    ref = np.asarray(fast.fast_score(jnp.asarray(img), 7))
    ours = np.asarray(
        fast_pallas.fast_score_pallas(jnp.asarray(img), 7, interpret=True)
    )
    np.testing.assert_array_equal(ours, ref)

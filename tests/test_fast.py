import cv2
import numpy as np
import jax.numpy as jnp

from iv_slam_tpu.ops import fast


def _test_img(rng, h=120, w=160):
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (5, 5), 1.5)
    return np.clip(img, 0, 255).astype(np.uint8)


def _cv2_fast(img, threshold, nonmax):
    det = cv2.FastFeatureDetector_create(
        threshold=threshold, nonmaxSuppression=nonmax,
        type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
    )
    kps = det.detect(img)
    return {(int(round(k.pt[1])), int(round(k.pt[0]))): k.response for k in kps}


def test_fast_detection_set_matches_cv2(rng):
    img = _test_img(rng)
    for th in (7, 12, 20):
        score = np.asarray(fast.fast_score(jnp.asarray(img), th))
        ours = set(zip(*np.nonzero(score)))
        ref = set(_cv2_fast(img, th, nonmax=False).keys())
        assert ours == ref, (
            f"th={th}: ours-only={list(ours - ref)[:5]} ref-only={list(ref - ours)[:5]}"
        )


def test_fast_scores_match_cv2(rng):
    img = _test_img(rng)
    ref = _cv2_fast(img, 12, nonmax=True)
    score = np.asarray(fast.detect(jnp.asarray(img), 12))
    ours = {(y, x): float(score[y, x]) for y, x in zip(*np.nonzero(score))}
    assert set(ours.keys()) == set(ref.keys()), (
        f"ours-only={list(set(ours) - set(ref))[:5]} "
        f"ref-only={list(set(ref) - set(ours))[:5]}"
    )
    for k in ref:
        assert abs(ours[k] - ref[k]) < 1e-3, (k, ours[k], ref[k])


def test_fast_border_is_clean():
    img = np.zeros((32, 32), np.uint8)
    img[::2, ::2] = 255  # pathological checkerboard
    score = np.asarray(fast.detect(jnp.asarray(img), 10))
    assert score[:3, :].max() == 0 and score[-3:, :].max() == 0
    assert score[:, :3].max() == 0 and score[:, -3:].max() == 0

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from iv_slam_tpu.config import ORBConfig
from iv_slam_tpu.ops import brief, extractor, orient, pyramid as pyr

import golden_orb


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(7)
    im = rng.uniform(0, 255, size=(240, 320)).astype(np.float32)
    im = cv2.GaussianBlur(im, (5, 5), 1.2)
    # add structure: corners/blobs
    for _ in range(40):
        y, x = rng.integers(20, 220), rng.integers(20, 300)
        im[y:y + 8, x:x + 8] = rng.uniform(0, 255)
    return np.clip(im, 0, 255).astype(np.uint8)


def test_pyramid_shapes_match_reference_rounding():
    shapes = pyr.pyramid_shapes(376, 1241, 1.2, 8)
    # cvRound chain on cumulative f32 scale factors
    sf = np.float32(1.0)
    exp = [(376, 1241)]
    for _ in range(7):
        sf = np.float32(sf * np.float32(1.2))
        exp.append((int(np.rint(376 / sf)), int(np.rint(1241 / sf))))
    assert shapes == exp


def test_pyramid_content_close_to_cv2(img):
    shapes = pyr.pyramid_shapes(*img.shape, 1.2, 4)
    ours = pyr.build_pyramid(jnp.asarray(img), shapes)
    ref = golden_orb.build_pyramid(img, 1.2, 4)
    for o, r in zip(ours, ref):
        assert o.shape == r.shape
        diff = np.abs(np.asarray(o).astype(int) - r.astype(int))
        assert diff.max() <= 2  # 1 LSB per chained resize


def test_ic_angles_match_golden(img):
    umax = golden_orb.umax_table()
    rng = np.random.default_rng(3)
    ys = rng.integers(19, img.shape[0] - 19, 50)
    xs = rng.integers(19, img.shape[1] - 19, 50)
    yx = jnp.asarray(np.stack([ys, xs], axis=1).astype(np.int32))
    ours = np.asarray(orient.ic_angles(jnp.asarray(img), yx))
    for k in range(50):
        ref = golden_orb.ic_angle(img, ys[k], xs[k], umax)
        d = abs(ours[k] - ref)
        assert min(d, 360 - d) < 1e-3, (k, ours[k], ref)


def test_ic_angles_integral_bit_identical(img):
    """The prefix-sum IC path (orient.ic_angles_integral) must equal the
    patch-gather path exactly — both compute exact integer moments."""
    rng = np.random.default_rng(7)
    ys = rng.integers(19, img.shape[0] - 19, 200)
    xs = rng.integers(19, img.shape[1] - 19, 200)
    yx = jnp.asarray(np.stack([ys, xs], axis=1).astype(np.int32))
    a = np.asarray(orient.ic_angles(jnp.asarray(img), yx))
    b = np.asarray(orient.ic_angles_integral(jnp.asarray(img), yx))
    np.testing.assert_array_equal(a, b)


def test_brief_descriptors_match_golden(img):
    pattern = brief.pattern()
    blurred = cv2.GaussianBlur(img, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
    rng = np.random.default_rng(4)
    ys = rng.integers(19, img.shape[0] - 19, 32)
    xs = rng.integers(19, img.shape[1] - 19, 32)
    angles = rng.uniform(0, 360, 32).astype(np.float32)
    yx = jnp.asarray(np.stack([ys, xs], axis=1).astype(np.int32))
    ours = np.asarray(
        brief.descriptors(jnp.asarray(blurred), yx, jnp.asarray(angles))
    )
    for k in range(32):
        ref = golden_orb.brief_descriptor(blurred, ys[k], xs[k], angles[k], pattern)
        assert np.array_equal(ours[k], ref), k


def test_extractor_matches_golden_keypoint_sets(img):
    cfg = ORBConfig(n_features=500, ini_th_fast=12, min_th_fast=7)
    ext = extractor.OrbExtractor(cfg, *img.shape)
    kp = ext(jnp.asarray(img))
    valid = np.asarray(kp.valid)
    ours = set()
    octv = np.asarray(kp.octave)
    yxl = np.asarray(kp.yx_level)
    for i in np.nonzero(valid)[0]:
        ours.add((int(octv[i]), int(yxl[i, 0]), int(yxl[i, 1])))

    golden = golden_orb.golden_extract(
        img, n_features=500, ini_th=12, min_th=7, n_levels=8
    )
    ref = {(g["level"], g["y"], g["x"]) for g in golden}
    inter = len(ours & ref)
    union = len(ours | ref)
    iou = inter / union
    # the selection logic is exact on identical pyramids (see
    # test_extractor_level_exact); end-to-end, +-1 LSB differences between
    # our float resize and cv2's fixed-point resize shift a few detections
    assert iou > 0.85, (iou, len(ours), len(ref))


def test_extractor_level_exact_on_same_pyramid(img):
    """With identical pyramid content, per-level keypoint sets are exact."""
    import functools
    import jax

    cfg = ORBConfig(n_features=500, ini_th_fast=12, min_th_fast=7)
    lays = extractor.make_layouts(cfg, *img.shape)
    ref_pyr = golden_orb.build_pyramid(img, 1.2, 8)
    budgets = golden_orb.features_per_level(500, 1.2, 8)
    ratio = img.shape[1] / img.shape[0]
    for lvl in (0, 3):
        lay = lays[lvl]
        fn = jax.jit(
            functools.partial(
                extractor._extract_level, lay=lay, ini_th=12, min_th=7,
                qual_l=None,
            )
        )
        y, x, resp, valid = fn(jnp.asarray(ref_pyr[lvl]))
        v = np.asarray(valid)
        ours = set(zip(np.asarray(y)[v].tolist(), np.asarray(x)[v].tolist()))
        ref = {
            (yy, xx)
            for yy, xx, _ in golden_orb.extract_level(
                ref_pyr[lvl], budgets[lvl], ratio, 12, 7
            )
        }
        assert ours == ref, (
            lvl, len(ours), len(ref), sorted(ours - ref)[:5], sorted(ref - ours)[:5]
        )


def test_extractor_descriptors_bit_exact_on_common_keypoints(img):
    cfg = ORBConfig(n_features=300, ini_th_fast=12, min_th_fast=7)
    ext = extractor.OrbExtractor(cfg, *img.shape)
    kp = ext(jnp.asarray(img))
    valid = np.asarray(kp.valid)
    octv, yxl = np.asarray(kp.octave), np.asarray(kp.yx_level)
    desc, ang = np.asarray(kp.desc), np.asarray(kp.angle)
    ours = {
        (int(octv[i]), int(yxl[i, 0]), int(yxl[i, 1])): (desc[i], ang[i])
        for i in np.nonzero(valid)[0]
    }
    golden = golden_orb.golden_extract(
        img, n_features=300, ini_th=12, min_th=7, n_levels=8,
        pattern=brief.pattern(),
    )
    n_common = 0
    hammings = []
    for g in golden:
        key = (g["level"], g["y"], g["x"])
        if key not in ours:
            continue
        n_common += 1
        d, a = ours[key]
        # angles and descriptors are exact given identical pixels
        # (test_ic_angles_match_golden / test_brief_descriptors_match_golden);
        # across the +-1-LSB pyramid difference vs cv2, weak-gradient patches
        # can rotate the intensity centroid a degree or two, flipping a
        # handful of near-tie BRIEF comparisons — descriptors must stay
        # within matching distance of the golden ones
        hamming = np.unpackbits(np.bitwise_xor(d, g["desc"])).sum()
        hammings.append(hamming)
    assert n_common > 100
    hammings = np.array(hammings)
    # level-0 descriptors are exact; coarser levels accumulate the chained
    # resize difference (each level re-resamples the previous), drifting a
    # few bits — far below the TH_LOW=50 matching threshold
    assert np.median(hammings) <= 6, np.median(hammings)
    assert hammings.mean() < 8, hammings.mean()
    assert (hammings < 35).mean() > 0.98, (hammings < 35).mean()
    assert (hammings < 64).all(), hammings.max()


def test_extractor_quality_weighting_shifts_budget(img):
    cfg = ORBConfig(n_features=400, enable_introspection=True)
    ext = extractor.OrbExtractor(cfg, *img.shape)
    # cost map: right half of the image is bad
    qual = np.zeros(img.shape, np.uint8)
    qual[:, img.shape[1] // 2:] = 255
    kp_w = ext(jnp.asarray(img), jnp.asarray(qual))
    kp_p = ext(jnp.asarray(img))
    xs_w = np.asarray(kp_w.xy)[np.asarray(kp_w.valid), 0]
    xs_p = np.asarray(kp_p.xy)[np.asarray(kp_p.valid), 0]
    frac_right_w = (xs_w > img.shape[1] / 2).mean()
    frac_right_p = (xs_p > img.shape[1] / 2).mean()
    assert frac_right_w < frac_right_p * 0.6


def test_hist_selection_matches_topk():
    """The integer-threshold ("hist") selection must reproduce the top_k
    path exactly — same keypoints, same slot order, same tie-breaking —
    on sparse synthetic score maps and on dense FAST maps of all levels."""
    import jax

    from iv_slam_tpu.ops.extractor import (
        _select_level_keypoints, _select_level_keypoints_hist, make_layouts)
    from iv_slam_tpu.ops import fast

    cfg = ORBConfig(n_features=800, n_levels=4)
    lays = make_layouts(cfg, 240, 320)
    rng = np.random.default_rng(0)
    for seed in range(3):
        r = np.random.default_rng(seed)
        for lay in lays:
            if not lay.active:
                continue
            smap = np.zeros((lay.h, lay.w), np.int16)
            n_pts = int(r.integers(30, 1500))
            ys = r.integers(0, lay.h, n_pts)
            xs = r.integers(0, lay.w, n_pts)
            smap[ys, xs] = r.integers(7, 255, n_pts)  # many duplicate scores
            sj = jnp.asarray(smap)
            ref = jax.jit(
                lambda s, lay=lay: _select_level_keypoints(s, None, lay, 20)
            )(sj)
            new = jax.jit(
                lambda s, lay=lay: _select_level_keypoints_hist(s, lay, 20)
            )(sj)
            rv = [np.asarray(v) for v in ref]
            nv = [np.asarray(v) for v in new]
            assert np.array_equal(rv[3], nv[3])
            m = rv[3]
            assert np.array_equal(rv[0][m], nv[0][m])
            assert np.array_equal(rv[1][m], nv[1][m])
            assert np.array_equal(rv[2][m], nv[2][m])
    # dense map through real FAST scoring
    img = rng.integers(0, 255, (240, 320)).astype(np.float32)
    lay = lays[0]
    smap = jax.jit(lambda x: fast.fast_score(x, 7))(jnp.asarray(img))
    ref = jax.jit(lambda s: _select_level_keypoints(s, None, lay, 20))(smap)
    new = jax.jit(lambda s: _select_level_keypoints_hist(s, lay, 20))(smap)
    for a, b in zip(ref[:2] + (ref[3],), new[:2] + (new[3],)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_batched_hist_equals_topk_extraction():
    """Full batched extraction: hist vs topk select_path give identical
    Keypoints (the batched path also batches the redistribution scan)."""
    import dataclasses
    import jax

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (240, 320)).astype(np.uint8)
    cfg_h = ORBConfig(n_features=500, n_levels=4, select_path="hist")
    cfg_t = ORBConfig(n_features=500, n_levels=4, select_path="topk")
    eh = extractor.OrbExtractor(cfg_h, *img.shape)
    et = extractor.OrbExtractor(cfg_t, *img.shape)
    kh = eh(jnp.asarray(img))
    kt = et(jnp.asarray(img))
    for f in ("xy", "response", "octave", "angle", "desc", "valid"):
        a, b = np.asarray(getattr(kh, f)), np.asarray(getattr(kt, f))
        assert np.array_equal(a, b), f

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from iv_slam_tpu.config import ORBConfig
from iv_slam_tpu.ops import extractor, pyramid as pyr, stereo

import golden_stereo


@pytest.fixture(scope="module")
def stereo_pair():
    rng = np.random.default_rng(11)
    h, w, disp = 240, 320, 14.0
    base = rng.uniform(0, 255, size=(h, w + 40)).astype(np.float32)
    base = cv2.GaussianBlur(base, (5, 5), 1.2)
    for _ in range(60):
        y, x = rng.integers(10, h - 10), rng.integers(10, w + 20)
        base[y:y + 6, x:x + 6] = rng.uniform(0, 255)
    left = np.clip(base[:, 40:40 + w], 0, 255).astype(np.uint8)
    # constant disparity: right image is the left shifted right by disp px
    sx = np.broadcast_to(
        np.arange(w, dtype=np.float32)[None, :] + disp, (h, w)
    ).copy()
    sy = np.broadcast_to(
        np.arange(h, dtype=np.float32)[:, None], (h, w)
    ).copy()
    right = cv2.remap(base[:, 40:], sx, sy, cv2.INTER_LINEAR)
    right = np.clip(right, 0, 255).astype(np.uint8)
    return left, right, disp


def _match(left, right, cfg, bf=100.0, min_z=100.0 / 300.0):
    ext = extractor.OrbExtractor(cfg, *left.shape)
    kl = ext(jnp.asarray(left))
    kr = ext(jnp.asarray(right))
    shapes = pyr.pyramid_shapes(*left.shape, cfg.scale_factor, cfg.n_levels)
    pl = pyr.build_pyramid(jnp.asarray(left), shapes)
    prr = pyr.build_pyramid(jnp.asarray(right), shapes)
    canvasL, offs = stereo.flatten_pyramid(pl)
    canvasR, _ = stereo.flatten_pyramid(prr)
    widths = np.array([s[1] for s in shapes], np.int32)
    sf = jnp.asarray(cfg.scale_factors())
    ur, depth = stereo.match_stereo(
        kl.xy, kl.octave, kl.desc, kl.valid,
        kr.xy, kr.octave, kr.desc, kr.valid,
        canvasL, canvasR, jnp.asarray(offs.astype(np.int32)),
        jnp.asarray(widths), sf, jnp.float32(bf), jnp.float32(min_z),
    )
    return kl, kr, np.asarray(ur), np.asarray(depth), (pl, prr, sf, bf, min_z)


def test_stereo_matches_recover_disparity(stereo_pair):
    left, right, disp = stereo_pair
    cfg = ORBConfig(n_features=400, n_levels=4)
    kl, kr, ur, depth, _ = _match(left, right, cfg)
    xy = np.asarray(kl.xy)
    matched = ur >= 0
    assert matched.sum() > 50
    est_disp = xy[matched, 0] - ur[matched]
    frac_good = (np.abs(est_disp - disp) < 1.0).mean()
    assert frac_good > 0.9, (frac_good, np.median(est_disp))


def test_stereo_matches_golden_exact(stereo_pair):
    left, right, _ = stereo_pair
    cfg = ORBConfig(n_features=300, n_levels=4)
    bf, min_z = 100.0, 1.0 / 3.0
    kl, kr, ur, depth, (pl, prr, sf, _, _) = _match(
        left, right, cfg, bf, min_z
    )
    vl = np.asarray(kl.valid)
    vr = np.asarray(kr.valid)
    kpL = [
        (float(x), float(y), int(o))
        for (x, y), o in zip(np.asarray(kl.xy)[vl], np.asarray(kl.octave)[vl])
    ]
    kpR = [
        (float(x), float(y), int(o))
        for (x, y), o in zip(np.asarray(kr.xy)[vr], np.asarray(kr.octave)[vr])
    ]
    g_ur, g_depth = golden_stereo.compute_stereo_matches(
        kpL, kpR,
        np.asarray(kl.desc)[vl], np.asarray(kr.desc)[vr],
        [np.asarray(p) for p in pl], [np.asarray(p) for p in prr],
        np.asarray(sf), bf, min_z,
    )
    ours_ur = ur[vl]
    both = (ours_ur >= 0) & (g_ur >= 0)
    agree = np.isclose(ours_ur[both], g_ur[both], atol=0.51)
    # match decisions should agree except rare ties
    assert ((ours_ur >= 0) == (g_ur >= 0)).mean() > 0.97
    assert agree.mean() > 0.97

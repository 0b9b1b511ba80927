"""argpack transport-losslessness guards (ADVICE r2 medium items).

The float32 wire carries only dtypes it can represent exactly; anything
else must raise instead of silently corrupting.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from iv_slam_tpu.utils import argpack


def _roundtrip(arrays):
    flat, spec = argpack.pack_host(arrays)
    return argpack.unpack(np.asarray(flat), spec)


def test_supported_dtypes_roundtrip_exact():
    arrays = [
        np.array([[1.5, -2.25], [0.0, 3e7]], np.float32),
        np.array([0, -1, 2 ** 24 - 1, -(2 ** 24 - 1)], np.int32),
        np.array([1, 2, 3], np.int64),  # downcast lossless under 2^24
        np.array([True, False, True]),
        np.array([0, 127, 255], np.uint8),
    ]
    out = _roundtrip(arrays)
    for a, b in zip(arrays, out):
        got = np.asarray(b)
        assert got.shape == a.shape
        np.testing.assert_array_equal(got, a)
    # int64 lands as int32, uint8 stays uint8 — never a silent re-kind
    assert np.asarray(out[1]).dtype == np.int32
    assert np.asarray(out[3]).dtype == np.bool_
    assert np.asarray(out[4]).dtype == np.uint8


def test_int_magnitude_guard_raises():
    with pytest.raises(ValueError, match="2\\^24"):
        argpack.pack_host([np.array([2 ** 24 + 1], np.int64)])
    # boundary: 2^24 itself is the first unrepresentable-neighbor zone
    with pytest.raises(ValueError):
        argpack.pack_host([np.array([-(2 ** 24)], np.int32)])
    # under the bound is fine
    argpack.pack_host([np.array([2 ** 24 - 1], np.int32)])


def test_lossy_dtypes_rejected():
    for bad in (np.uint16, np.uint32, np.uint64, np.float16):
        with pytest.raises(TypeError, match="lossless"):
            argpack.pack_host([np.zeros(3, bad)])


def test_rectify_strict_raises_on_missing_keys():
    from iv_slam_tpu.io import rectify

    doc = {"LEFT.K": {"data": list(np.eye(3).ravel())}}  # no D/R/P/h/w
    with pytest.raises(ValueError, match="LEFT"):
        rectify.load_rectification_from_yaml(doc, "LEFT")
    assert rectify.load_rectification_from_yaml(
        doc, "LEFT", strict=False) is None

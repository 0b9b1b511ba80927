"""Asynchronous stereo image prefetcher.

The reference decodes each stereo pair synchronously on the tracking
thread (stereo_kitti.cc:444-468: cv::imread + optional cv::remap per
frame). Here decode + rectification run ahead of the consumer in the
native C++ worker pool (iv_slam_tpu/native/src/ivslam_io.cpp) so the
driver's per-frame cost is a queue pop; when the native extension isn't
built, a Python thread-pool fallback provides identical semantics.

Usage:
    pf = StereoPrefetcher(seq.left_paths, seq.right_paths,
                          rect_maps=(maps_l, maps_r))
    for i in range(len(seq)):
        left, right = pf.next()
    pf.close()
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import glob as _glob
    import importlib.util as _ilu
    import os as _os

    _io_native = None
    for _so in _glob.glob(
        _os.path.join(_os.path.dirname(__file__), "..", "native",
                      "_ivslam_io*.so")
    ):
        _spec = _ilu.spec_from_file_location("_ivslam_io", _so)
        _io_native = _ilu.module_from_spec(_spec)
        try:
            _spec.loader.exec_module(_io_native)
        except Exception:
            _io_native = None
        break
except Exception:  # pragma: no cover
    _io_native = None


def native_available() -> bool:
    return _io_native is not None


class StereoPrefetcher:
    """Decode-ahead loader for a stereo path sequence, in order.

    rect_maps: ((m1x, m1y), (m2x, m2y)) float32 rectification maps per
    side (io/rectify.py `rectification_maps` output), or None entries to
    pass a side through unrectified.
    """

    def __init__(
        self,
        left_paths: Sequence[str],
        right_paths: Sequence[str],
        rect_maps=None,
        prefetch: int = 4,
        threads: int = 2,
        use_native: Optional[bool] = None,
        right_mode: str = "gray",
    ):
        """right_mode: "gray" (stereo right image), "unchanged" (16-bit
        RGB-D depth PNGs), or "skip" (monocular — next() yields None)."""
        if len(left_paths) != len(right_paths):
            raise ValueError("left/right path counts differ")
        mode_id = {"gray": 0, "unchanged": 1, "skip": 2}[right_mode]
        self._n = len(left_paths)
        self._emitted = 0
        maps_l = maps_r = None
        if rect_maps is not None:
            maps_l, maps_r = rect_maps
        if use_native is None:
            use_native = _io_native is not None
        if use_native and _io_native is None:
            raise RuntimeError("_ivslam_io extension not built")
        self._native = use_native
        if use_native:
            self._id = _io_native.open(
                list(left_paths), list(right_paths), prefetch, threads,
                mode_id,
            )
            if maps_l is not None or maps_r is not None:
                def f32(m):
                    return None if m is None else np.ascontiguousarray(
                        m, np.float32)
                l1, l2 = (maps_l or (None, None))
                r1, r2 = (maps_r or (None, None))
                _io_native.set_rectify(
                    self._id, f32(l1), f32(l2), f32(r1), f32(r2))
        else:
            from concurrent.futures import ThreadPoolExecutor

            from . import rectify as _rect
            from .datasets import load_gray

            def job(i):
                l = load_gray(left_paths[i])
                if right_mode == "skip":
                    r = None
                elif right_mode == "unchanged":
                    import imageio.v3 as iio

                    r = iio.imread(right_paths[i])
                else:
                    r = load_gray(right_paths[i])
                if maps_l is not None:
                    l = _rect.remap(l, maps_l)
                if r is not None and maps_r is not None:
                    r = _rect.remap(r, maps_r)
                return l, r

            self._pool = ThreadPoolExecutor(max_workers=max(threads, 1))
            self._job = job
            self._prefetch = max(prefetch, 1)
            self._futures = [
                self._pool.submit(job, i)
                for i in range(min(self._prefetch, self._n))
            ]
            self._submitted = len(self._futures)

    def __len__(self):
        return self._n

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._emitted >= self._n:
            raise StopIteration("sequence exhausted")
        if self._native:
            out = _io_native.next(self._id)
        else:
            out = self._futures.pop(0).result()
            if self._submitted < self._n:
                self._futures.append(
                    self._pool.submit(self._job, self._submitted))
                self._submitted += 1
        self._emitted += 1
        return out

    def close(self):
        if self._native:
            if self._id is not None:
                _io_native.close(self._id)
                self._id = None
        elif getattr(self, "_pool", None) is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

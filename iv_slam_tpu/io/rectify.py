"""Stereo rectification maps (the reference's LEFT.*/RIGHT.* YAML blocks +
cv::initUndistortRectifyMap flow: stereo_kitti.cc:286-343,
feature_evaluator.cpp:272-310 LoadRectificationMap / UnrectifyImage).

Map computation happens once on the host (cv2 when present, NumPy
fallback); per-frame remapping of images or cost maps is a host cv2.remap
(the frame-rate cost is negligible next to the device frontend).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def rectification_maps(
    K: np.ndarray, D: np.ndarray, R: np.ndarray, P: np.ndarray,
    width: int, height: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """cv::initUndistortRectifyMap(K, D, R, P[:3,:3], (w,h), CV_32F)."""
    try:
        import cv2

        m1, m2 = cv2.initUndistortRectifyMap(
            K.astype(np.float64), D.astype(np.float64), R.astype(np.float64),
            P[:3, :3].astype(np.float64), (width, height), cv2.CV_32FC1,
        )
        return m1, m2
    except ImportError:
        pass
    # NumPy fallback: for each rectified pixel, apply R^-1 then distort
    u, v = np.meshgrid(np.arange(width), np.arange(height))
    Pn = P[:3, :3]
    x = (u - Pn[0, 2]) / Pn[0, 0]
    y = (v - Pn[1, 2]) / Pn[1, 1]
    pts = np.stack([x, y, np.ones_like(x)], axis=-1) @ np.linalg.inv(R).T
    x = pts[..., 0] / pts[..., 2]
    y = pts[..., 1] / pts[..., 2]
    k1, k2, p1, p2, k3 = (list(D.ravel()) + [0.0] * 5)[:5]
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    m1 = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    m2 = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return m1, m2


def load_rectification_from_yaml(doc: dict, side: str = "LEFT",
                                 strict: bool = True):
    """Pull LEFT.*/RIGHT.* rectification blocks out of a parsed reference
    settings YAML (EuRoC-style; Tracking.cc / stereo_euroc.cc).

    With ``strict`` (the default), a missing or incomplete block raises
    ValueError — mirroring the reference's CHECK/LOG(FATAL) semantics
    (Tracking.cc:536-539): silently running unrectified when the caller
    asked for rectification corrupts every downstream measurement.
    ``strict=False`` restores the probe behavior (returns None).
    """
    def mat(key, rows, cols):
        node = doc.get(f"{side}.{key}")
        if node is None:
            return None
        data = node["data"] if isinstance(node, dict) else node
        return np.asarray(data, np.float64).reshape(rows, cols)

    K = mat("K", 3, 3)
    D_node = doc.get(f"{side}.D")
    D = (
        np.asarray(
            D_node["data"] if isinstance(D_node, dict) else D_node, np.float64
        ).ravel()
        if D_node is not None
        else None
    )
    R = mat("R", 3, 3)
    P = mat("P", 3, 4)
    h = doc.get(f"{side}.height")
    w = doc.get(f"{side}.width")
    missing = [k for k, v in
               (("K", K), ("D", D), ("R", R), ("P", P),
                ("height", h), ("width", w)) if v is None]
    if missing:
        if strict:
            raise ValueError(
                f"rectification requested but settings YAML is missing "
                f"{side}.{{{', '.join(missing)}}} "
                "(reference CHECKs these: Tracking.cc:536-539)")
        return None
    return rectification_maps(K, D, R, P, int(w), int(h))


def remap(img: np.ndarray, maps, interpolation: str = "linear") -> np.ndarray:
    import cv2

    interp = cv2.INTER_LINEAR if interpolation == "linear" else cv2.INTER_NEAREST
    return cv2.remap(img, maps[0], maps[1], interp)

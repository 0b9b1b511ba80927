"""Loader for the native host extension, with NumPy fallbacks.

Build with: cd iv_slam_tpu/native && python setup.py build_ext --inplace
"""

from __future__ import annotations

import glob
import importlib.util
import os

import numpy as np

_native = None
_dir = os.path.dirname(__file__)
for so in glob.glob(os.path.join(_dir, "_ivslam_native*.so")):
    spec = importlib.util.spec_from_file_location("_ivslam_native", so)
    _native = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(_native)
    except Exception:
        _native = None
    break


def available() -> bool:
    return _native is not None


def hamming_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if _native is not None:
        return _native.hamming_matrix(
            np.ascontiguousarray(a, np.uint8), np.ascontiguousarray(b, np.uint8)
        )
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return np.unpackbits(x, axis=-1).sum(axis=-1).astype(np.int32)


def parse_vocab_text(path: str):
    if _native is not None:
        return _native.parse_vocab_text(path)
    # NumPy fallback (slow for million-node vocabularies)
    with open(path) as f:
        header = f.readline().split()
        k, L, scoring, weighting = (int(v) for v in header[:4])
        parents, descs, weights, leaves = [-1], [np.zeros(32, np.uint8)], [0.0], [0]
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            leaves.append(int(parts[1]))
            descs.append(np.array([int(v) for v in parts[2:34]], np.uint8))
            weights.append(float(parts[34]))
    return (
        k, L, scoring, weighting,
        np.array(parents, np.int32), np.stack(descs),
        np.array(weights, np.float32), np.array(leaves, np.uint8),
    )


def vocab_transform(children: np.ndarray, node_desc: np.ndarray,
                    desc: np.ndarray) -> np.ndarray:
    if _native is not None:
        return _native.vocab_transform(
            np.ascontiguousarray(children, np.int32),
            np.ascontiguousarray(node_desc, np.uint8),
            np.ascontiguousarray(desc, np.uint8),
        )
    out = np.zeros(desc.shape[0], np.int32)
    for i in range(desc.shape[0]):
        node = 0
        while children[node, 0] >= 0:
            kids = children[node]
            kids = kids[kids >= 0]
            d = hamming_matrix(desc[i:i + 1], node_desc[kids])[0]
            node = int(kids[np.argmin(d)])
        out[i] = node
    return out

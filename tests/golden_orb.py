"""Golden NumPy/cv2 re-derivation of the reference ORB extraction algorithm
(ORBextractor.cc:880-1296), used as the oracle for the JAX extractor.

This mirrors the documented behavior step by step with per-cell cv2.FAST —
the scalar-loop shape the reference uses — so the dense TPU implementation
can be validated against it.
"""

import math

import cv2
import numpy as np

EDGE = 19
HALF_PATCH = 15


def umax_table():
    umax = np.zeros(HALF_PATCH + 1, dtype=np.int64)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(np.rint(np.sqrt(HALF_PATCH**2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


def ic_angle(img, y, x, umax):
    m01 = 0
    m10 = 0
    for u in range(-HALF_PATCH, HALF_PATCH + 1):
        m10 += u * int(img[y, x + u])
    for v in range(1, HALF_PATCH + 1):
        v_sum = 0
        d = umax[v]
        for u in range(-d, d + 1):
            vp = int(img[y + v, x + u])
            vm = int(img[y - v, x + u])
            v_sum += vp - vm
            m10 += u * (vp + vm)
        m01 += v * v_sum
    return cv2.fastAtan2(float(m01), float(m10))


def brief_descriptor(blurred, y, x, angle_deg, pattern):
    a = np.float32(np.cos(np.float32(angle_deg) * np.float32(np.pi / 180)))
    b = np.float32(np.sin(np.float32(angle_deg) * np.float32(np.pi / 180)))
    desc = np.zeros(32, np.uint8)
    px = pattern[:, 0].astype(np.float32)
    py = pattern[:, 1].astype(np.float32)
    rows = np.rint(px * b + py * a).astype(int)
    cols = np.rint(px * a - py * b).astype(int)
    vals = blurred[y + rows, x + cols]
    bits = vals[0::2] < vals[1::2]
    for i in range(32):
        byte = 0
        for j in range(8):
            byte |= int(bits[i * 8 + j]) << j
        desc[i] = byte
    return desc


def features_per_level(n_features, scale_factor, n_levels):
    factor = 1.0 / scale_factor
    ndesired = n_features * (1 - factor) / (1 - factor**n_levels)
    per = []
    total = 0
    for _ in range(n_levels - 1):
        per.append(int(round(ndesired)))
        total += per[-1]
        ndesired *= factor
    per.append(max(n_features - total, 0))
    return per


def build_pyramid(img, scale_factor, n_levels):
    levels = [img]
    scale = np.float32(1.0)
    h0, w0 = img.shape
    for lvl in range(1, n_levels):
        scale = np.float32(scale * np.float32(scale_factor))
        w = int(np.rint(np.float32(w0) / scale))
        h = int(np.rint(np.float32(h0) / scale))
        levels.append(cv2.resize(levels[-1], (w, h), interpolation=cv2.INTER_LINEAR))
    return levels


def extract_level(img_l, n_desired, ratio, ini_th, min_th):
    """Returns a list of (y, x, response) at native-level coords."""
    h, w = img_l.shape
    level_cols = int(math.sqrt(n_desired / (5.0 * ratio)))
    level_rows = int(ratio * level_cols)
    minB = EDGE
    maxBX, maxBY = w - EDGE, h - EDGE
    W, H = maxBX - minB, maxBY - minB
    cell_w = math.ceil(W / level_cols)
    cell_h = math.ceil(H / level_rows)
    n_cells = level_rows * level_cols
    nfeat_cell = math.ceil(n_desired / n_cells)

    det_i = cv2.FastFeatureDetector_create(ini_th, True)
    det_m = cv2.FastFeatureDetector_create(min_th, True)

    cells = {}
    n_total = np.zeros(n_cells, int)
    budgets = np.full(n_cells, nfeat_cell, int)
    hY = cell_h + 6
    iniYRow = {}
    iniXCol = {}
    for i in range(level_rows):
        iniY = minB + i * cell_h - 3
        iniYRow[i] = iniY
        if i == level_rows - 1:
            hY = maxBY + 3 - iniY
            if hY <= 0:
                continue
        hX = cell_w + 6
        for j in range(level_cols):
            if i == 0:
                iniXCol[j] = minB + j * cell_w - 3
            iniX = iniXCol[j]
            if j == level_cols - 1:
                hX = maxBX + 3 - iniX
                if hX <= 0:
                    continue
            window = img_l[iniY:iniY + hY, iniX:iniX + hX]
            kps = det_i.detect(window)
            if len(kps) <= 3:
                kps = det_m.detect(window)
            c = i * level_cols + j
            cells[c] = [
                (iniY + int(round(k.pt[1])), iniX + int(round(k.pt[0])), k.response)
                for k in kps
            ]
            n_total[c] = len(kps)

    # retention bookkeeping (ORBextractor.cc:1083-1132)
    retain = np.minimum(n_total, budgets)
    no_more = n_total <= budgets
    d = int(np.sum(np.where(no_more, budgets - n_total, 0)))
    n_no_more = int(no_more.sum())
    if d > 0 and n_no_more < n_cells:
        for c in range(n_cells):
            if not no_more[c]:
                new_budget = budgets[c] + math.ceil(d / (n_cells - n_no_more))
                if n_total[c] > new_budget:
                    retain[c] = new_budget
                else:
                    retain[c] = n_total[c]
                    d += new_budget - n_total[c]
                    no_more[c] = True
                    n_no_more += 1

    out = []
    for c in range(n_cells):
        kps = sorted(cells.get(c, []), key=lambda t: -t[2])[: retain[c]]
        out.extend(kps)
    if len(out) > n_desired:
        out = sorted(out, key=lambda t: -t[2])[:n_desired]
    return out


def golden_extract(img, n_features=500, scale_factor=1.2, n_levels=8,
                   ini_th=12, min_th=7, pattern=None):
    """Full golden pipeline. Returns list of dicts per keypoint."""
    levels = build_pyramid(img, scale_factor, n_levels)
    budgets = features_per_level(n_features, scale_factor, n_levels)
    ratio = img.shape[1] / img.shape[0]
    umax = umax_table()
    results = []
    scale = 1.0
    scales = [float(np.float32(scale_factor)) ** l for l in range(n_levels)]
    # cumulative f32 product, as stored by the reference
    sf = [np.float32(1.0)]
    for _ in range(1, n_levels):
        sf.append(np.float32(sf[-1] * np.float32(scale_factor)))
    for lvl in range(n_levels):
        img_l = levels[lvl]
        kps = extract_level(img_l, budgets[lvl], ratio, ini_th, min_th)
        blurred = cv2.GaussianBlur(img_l, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
        for (y, x, resp) in kps:
            ang = ic_angle(img_l, y, x, umax)
            desc = (
                brief_descriptor(blurred, y, x, ang, pattern)
                if pattern is not None
                else None
            )
            results.append(
                dict(level=lvl, y=y, x=x, response=resp, angle=ang, desc=desc,
                     x0=float(np.float32(x) * sf[lvl]),
                     y0=float(np.float32(y) * sf[lvl]))
            )
    return results

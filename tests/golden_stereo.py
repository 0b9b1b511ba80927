"""NumPy re-derivation of Frame::ComputeStereoMatches (Frame.cc:758-932)."""

import math

import numpy as np

TH_HIGH, TH_LOW = 100, 50


def hamming(a, b):
    return bin(int.from_bytes(a.tobytes(), "little")
               ^ int.from_bytes(b.tobytes(), "little")).count("1")


def compute_stereo_matches(
    kpL, kpR, descL, descR, pyrL, pyrR, scale_factors, bf, min_z
):
    """kpL/kpR: list of (u, v, octave) level-0 coords; desc: (N, 32) u8;
    pyr: list of per-level uint8 images. Returns (u_right, depth) arrays."""
    n = len(kpL)
    u_right = np.full(n, -1.0, np.float32)
    depth = np.full(n, -1.0, np.float32)
    n_rows = pyrL[0].shape[0]
    row_indices = [[] for _ in range(n_rows)]
    for i_r, (u, v, octv) in enumerate(kpR):
        r = 2.0 * scale_factors[octv]
        for yi in range(int(math.floor(v - r)), int(math.ceil(v + r)) + 1):
            if 0 <= yi < n_rows:
                row_indices[yi].append(i_r)

    th_orb = (TH_HIGH + TH_LOW) // 2
    max_d = bf / min_z
    dist_idx = []
    for i_l, (uL, vL, octL) in enumerate(kpL):
        cands = row_indices[int(vL)]
        if not cands:
            continue
        min_u, max_u = uL - max_d, uL
        if max_u < 0:
            continue
        best_dist, best_r = TH_HIGH, 0
        for i_r in cands:
            uR, vR, octR = kpR[i_r]
            if octR < octL - 1 or octR > octL + 1:
                continue
            if min_u <= uR <= max_u:
                d = hamming(descL[i_l], descR[i_r])
                if d < best_dist:
                    best_dist, best_r = d, i_r
        if best_dist >= th_orb:
            continue
        inv = 1.0 / scale_factors[octL]
        su_l = round(uL * inv)
        sv_l = round(vL * inv)
        su_r0 = round(kpR[best_r][0] * inv)
        w, L = 5, 5
        img_l, img_r = pyrL[octL].astype(np.float32), pyrR[octL].astype(np.float32)
        if su_r0 + L + w + 1 >= img_r.shape[1] or su_r0 - L - w < 0:
            continue
        IL = img_l[sv_l - w:sv_l + w + 1, su_l - w:su_l + w + 1].copy()
        IL -= IL[w, w]
        dists = np.zeros(2 * L + 1, np.float32)
        best_sad, best_inc = np.inf, 0
        for inc in range(-L, L + 1):
            IR = img_r[sv_l - w:sv_l + w + 1,
                       su_r0 + inc - w:su_r0 + inc + w + 1].copy()
            IR -= IR[w, w]
            sad = np.abs(IL - IR).sum()
            if sad < best_sad:
                best_sad, best_inc = sad, inc
            dists[L + inc] = sad
        if best_inc in (-L, L):
            continue
        d1, d2, d3 = dists[L + best_inc - 1], dists[L + best_inc], dists[L + best_inc + 1]
        denom = 2.0 * (d1 + d3 - 2 * d2)
        if denom == 0:
            continue
        delta = (d1 - d3) / denom
        if not (-1 <= delta <= 1):
            continue
        best_ur = scale_factors[octL] * (su_r0 + best_inc + delta)
        disp = uL - best_ur
        if 0 <= disp < max_d:
            if disp <= 0:
                disp, best_ur = 0.01, uL - 0.01
            depth[i_l] = bf / disp
            u_right[i_l] = best_ur
            dist_idx.append((best_sad, i_l))

    if dist_idx:
        dist_idx.sort()
        median = dist_idx[len(dist_idx) // 2][0]
        th = 1.5 * 1.4 * median
        for sad, i_l in dist_idx:
            if sad >= th:
                u_right[i_l] = -1.0
                depth[i_l] = -1.0
    return u_right, depth

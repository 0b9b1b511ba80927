"""Monocular map initialization (src/Initializer.cc re-designed).

The reference races a homography and a fundamental-matrix model over 200
8-point RANSAC iterations, picks by score ratio RH = SH/(SH+SF) > 0.40,
then recovers motion (Faugeras decomposition for H, essential decomposition
for F) and triangulates (Initializer.cc:25-931). TPU shape: all hypotheses
are one vmapped normalized-DLT batch; model scoring is a (hyp, N) masked
reduction; the four E decompositions are checked with one batched
triangulation pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

TH_H = 5.991   # symmetric-transfer chi2 threshold, homography
TH_F = 3.841   # point-line chi2 threshold, fundamental
TH_SCORE = 5.991  # score saturation for both (Initializer.cc CheckFundamental)


class InitResult(NamedTuple):
    ok: jnp.ndarray          # () bool
    R: jnp.ndarray           # (3, 3) R21
    t: jnp.ndarray           # (3,) t21 (unit norm)
    points: jnp.ndarray      # (N, 3) triangulated points in frame-1 coords
    is_good: jnp.ndarray     # (N,) triangulated + checks passed
    used_homography: jnp.ndarray


def _normalize(pts):
    mean = pts.mean(axis=0)
    d = jnp.abs(pts - mean).mean(axis=0)
    s = 1.0 / jnp.maximum(d, 1e-9)
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]],
         [0.0, 0.0, 1.0]]
    )
    return (pts - mean) * s, T


def _dlt_h(p1, p2):
    """8-point homography via SVD of the 2N x 9 system."""
    n = p1.shape[0]
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros(n)
    o = jnp.ones(n)
    rows1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=1)
    rows2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=1)
    A = jnp.concatenate([rows1, rows2], axis=0)
    _, _, Vt = jnp.linalg.svd(A)
    return Vt[-1].reshape(3, 3)


def _dlt_f(p1, p2):
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=1,
    )
    _, _, Vt = jnp.linalg.svd(A)
    F = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    return U @ jnp.diag(S.at[2].set(0.0)) @ Vt2


def _score_h(H21, p1, p2, valid):
    H12 = jnp.linalg.inv(H21)

    def transfer(H, a, b):
        ah = jnp.concatenate([a, jnp.ones((a.shape[0], 1))], axis=1)
        proj = ah @ H.T
        proj = proj[:, :2] / proj[:, 2:3]
        return jnp.sum((b - proj) ** 2, axis=1)

    e1 = transfer(H12, p2, p1)
    e2 = transfer(H21, p1, p2)
    ok = (e1 < TH_H) & (e2 < TH_H) & valid
    score = jnp.where(
        valid & (e1 < TH_H), TH_SCORE - e1, 0.0
    ) + jnp.where(valid & (e2 < TH_H), TH_SCORE - e2, 0.0)
    return jnp.sum(score), ok


def _score_f(F21, p1, p2, valid):
    p1h = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], axis=1)
    p2h = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], axis=1)
    l2 = p1h @ F21.T                # epipolar lines in image 2
    l1 = p2h @ F21                  # lines in image 1
    d2 = (jnp.sum(p2h * l2, axis=1) ** 2) / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12
    )
    d1 = (jnp.sum(p1h * l1, axis=1) ** 2) / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12
    )
    ok = (d1 < TH_F) & (d2 < TH_F) & valid
    score = jnp.where(
        valid & (d1 < TH_F), TH_SCORE - d1, 0.0
    ) + jnp.where(valid & (d2 < TH_F), TH_SCORE - d2, 0.0)
    return jnp.sum(score), ok


def _triangulate(R, t, K, p1, p2):
    """Linear triangulation of matched pixels into frame-1 coords."""
    P1 = K @ jnp.eye(3, 4)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)

    def one(a, b):
        A = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ]
        )
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)

    return jax.vmap(one)(p1, p2)


def _decompose_h(H21: jnp.ndarray, K: jnp.ndarray):
    """Faugeras (1988) homography decomposition into 8 (R, t) hypotheses
    (the reference's Initializer::ReconstructH candidate set)."""
    A = jnp.linalg.inv(K) @ H21 @ K
    U, S, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = S[0], S[1], S[2]

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / denom)
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / denom)
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' = d2
    st_base = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        eps = jnp.sign(x1s[i] * x3s[i] + 1e-20)
        st = eps * st_base
        Rp = jnp.array(
            [[ct, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, ct]]
        )
        Rp = Rp.at[0, 2].set(-st).at[2, 0].set(st)
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    # case d' = -d2
    sp_base = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        eps = jnp.sign(x1s[i] * x3s[i] + 1e-20)
        sp = eps * sp_base
        Rp = jnp.array(
            [[cp, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -cp]]
        )
        Rp = Rp.at[0, 2].set(sp).at[2, 0].set(sp)
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    R_stack = jnp.stack(Rs)
    t_stack = jnp.stack(ts)
    t_stack = t_stack / jnp.maximum(
        jnp.linalg.norm(t_stack, axis=1, keepdims=True), 1e-12
    )
    return R_stack, t_stack


def _check_rt(R, t, K, p1, p2, valid, sigma2=1.0):
    """Count triangulated points passing depth/parallax/reprojection checks
    (Initializer::CheckRT)."""
    X = _triangulate(R, t, K, p1, p2)
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    finite = jnp.all(jnp.isfinite(X), axis=1)

    def project(P):
        return jnp.stack(
            [
                K[0, 0] * P[:, 0] / P[:, 2] + K[0, 2],
                K[1, 1] * P[:, 1] / P[:, 2] + K[1, 2],
            ],
            axis=1,
        )

    e1 = jnp.sum((project(X) - p1) ** 2, axis=1)
    e2 = jnp.sum((project(Xc2) - p2) ** 2, axis=1)
    # parallax
    O2 = -R.T @ t
    n1 = X
    n2 = X - O2
    cos_par = jnp.sum(n1 * n2, axis=1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=1) * jnp.linalg.norm(n2, axis=1), 1e-12
    )
    good = (
        valid & finite & (z1 > 0) & (z2 > 0)
        & (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2)
        & (cos_par < 0.99998)
    )
    return good, X, cos_par


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def initialize_mono(
    p1: jnp.ndarray,      # (N, 2) keypoints in frame 1
    p2: jnp.ndarray,      # (N, 2) matched keypoints in frame 2
    valid: jnp.ndarray,   # (N,)
    K: jnp.ndarray,       # (3, 3)
    key: jnp.ndarray,
    n_hyp: int = 200,
) -> InitResult:
    n = p1.shape[0]
    p1n, T1 = _normalize(p1)
    p2n, T2 = _normalize(p2)
    probs = jnp.where(valid, 1.0, 0.0) / jnp.maximum(jnp.sum(valid), 1)
    keys = jax.random.split(key, n_hyp)

    def sample(k):
        return jax.random.choice(k, n, shape=(8,), replace=False, p=probs)

    idx = jax.vmap(sample)(keys)

    def hyp_h(s):
        Hn = _dlt_h(p1n[s], p2n[s])
        H21 = jnp.linalg.inv(T2) @ Hn @ T1
        return _score_h(H21, p1, p2, valid)[0], H21

    def hyp_f(s):
        Fn = _dlt_f(p1n[s], p2n[s])
        F21 = T2.T @ Fn @ T1
        return _score_f(F21, p1, p2, valid)[0], F21

    sh, Hs = jax.vmap(hyp_h)(idx)
    sf, Fs = jax.vmap(hyp_f)(idx)
    best_h = jnp.argmax(sh)
    best_f = jnp.argmax(sf)
    SH, SF = sh[best_h], sf[best_f]
    H21 = Hs[best_h]
    F21 = Fs[best_f]
    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40

    _, inl_h = _score_h(H21, p1, p2, valid)
    _, inl_f = _score_f(F21, p1, p2, valid)

    model_inl = jnp.where(use_h, inl_h, inl_f)

    # motion hypotheses: Faugeras decomposition (8) for the H model,
    # essential decomposition (4, padded to 8) for the F model
    E = K.T @ F21 @ K
    U, S, Vt = jnp.linalg.svd(E)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    tu = U[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-12)
    cands_R_f = jnp.stack([R1, R1, R2, R2, R1, R1, R2, R2])
    cands_t_f = jnp.stack([tu, -tu, tu, -tu, tu, -tu, tu, -tu])

    cands_R_h, cands_t_h = _decompose_h(H21, K)

    cands_R = jnp.where(use_h, cands_R_h, cands_R_f)
    cands_t = jnp.where(use_h, cands_t_h, cands_t_f)

    goods, Xs, pars = jax.vmap(
        lambda R, t: _check_rt(R, t, K, p1, p2, model_inl)
    )(cands_R, cands_t)
    counts = jnp.sum(goods.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    n_best = counts[best]
    n_inl = jnp.sum(model_inl.astype(jnp.int32))
    # acceptance (Initializer::ReconstructF): one clearly-best decomposition
    # (no other candidate above 0.7 * best), >= 90% of inliers triangulated,
    # and at least 50 points
    n_similar = jnp.sum((counts > 0.7 * n_best).astype(jnp.int32))
    ok = (
        (n_similar == 1)
        & (n_best >= jnp.maximum(50, (0.9 * n_inl).astype(jnp.int32)))
    )
    return InitResult(
        ok=ok,
        R=cands_R[best],
        t=cands_t[best],
        points=Xs[best],
        is_good=goods[best],
        used_homography=use_h,
    )

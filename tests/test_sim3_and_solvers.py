import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.smoke

from iv_slam_tpu.geometry import se3, sim3 as s3
from iv_slam_tpu.solvers import sim3_solver, pnp, essential_graph as eg


def rand_sim3(rng, scale_range=(0.5, 2.0)):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0, 2.5)
    xi = np.concatenate(
        [w, rng.normal(size=3),
         [np.log(rng.uniform(*scale_range))]]
    ).astype(np.float32)
    return jnp.asarray(xi)


def test_sim3_exp_log_roundtrip(rng):
    for _ in range(8):
        xi = rand_sim3(rng)
        S = s3.sim3_exp(xi)
        xi2 = s3.sim3_log(S)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-3)


def test_sim3_compose_inverse(rng):
    A = s3.sim3_exp(rand_sim3(rng))
    B = s3.sim3_exp(rand_sim3(rng))
    x = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    # (A o B)(x) == A(B(x))
    np.testing.assert_allclose(
        np.asarray(A.compose(B).act(x)), np.asarray(A.act(B.act(x))), atol=1e-3
    )
    ident = A.compose(A.inverse())
    np.testing.assert_allclose(np.asarray(ident.act(x)), np.asarray(x), atol=1e-3)


def test_horn_sim3_recovers_exact_transform(rng):
    S = s3.sim3_exp(rand_sim3(rng))
    P1 = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32) * 5)
    P2 = S.act(P1)
    R, t, s = sim3_solver.horn_sim3(P1, P2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(S.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(S.t), atol=1e-3)
    np.testing.assert_allclose(float(s), float(S.s), atol=1e-4)


def test_sim3_ransac_with_outliers(rng):
    S = s3.sim3_exp(jnp.asarray(
        np.array([0.1, -0.2, 0.05, 0.5, 1.0, -0.3, np.log(1.3)], np.float32)
    ))
    n = 60
    P1 = np.stack([rng.uniform(-5, 5, n), rng.uniform(-3, 3, n),
                   rng.uniform(4, 20, n)], axis=1).astype(np.float32)
    P2 = np.array(S.act(jnp.asarray(P1)))
    P2[:12] += rng.uniform(2, 5, (12, 3))  # outliers
    fx = fy = 500.0
    cx, cy = 320.0, 240.0

    def project(P):
        return np.stack(
            [fx * P[:, 0] / P[:, 2] + cx, fy * P[:, 1] / P[:, 2] + cy], axis=1
        )

    uv1 = project(P1)
    uv2 = project(np.asarray(S.act(jnp.asarray(P1))))
    res = sim3_solver.sim3_ransac(
        jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(n), jnp.ones(n, bool),
        fx, fy, cx, cy, jax.random.PRNGKey(0), n_hyp=128,
    )
    assert int(res.n_inliers) >= 40
    inl = np.asarray(res.inliers)
    assert not inl[:12].any()
    np.testing.assert_allclose(float(res.s), float(S.s), rtol=0.05)


def test_sim3_ransac_valid_prefix_padding(rng):
    """Loop-closing call shape (advisor r4 high): m real matches padded
    to a fixed capacity N. Hypothesis sampling must draw from [0, m)
    only — a uniform draw over N leaves ~(m/N)^3 clean triples and the
    solver silently fails (n_inliers < 20, loop closure disabled)."""
    S = s3.sim3_exp(jnp.asarray(
        np.array([0.05, -0.1, 0.02, 0.3, 0.6, -0.2, 0.0], np.float32)
    ))
    m, N = 40, 1024
    P1 = np.zeros((N, 3), np.float32)
    P2 = np.zeros((N, 3), np.float32)
    P1[:m] = np.stack([rng.uniform(-5, 5, m), rng.uniform(-3, 3, m),
                       rng.uniform(4, 20, m)], axis=1)
    P2[:m] = np.asarray(S.act(jnp.asarray(P1[:m])))
    fx = fy = 500.0
    cx, cy = 320.0, 240.0

    def project(P):
        z = np.maximum(P[:, 2], 1e-9)
        return np.stack([fx * P[:, 0] / z + cx, fy * P[:, 1] / z + cy],
                        axis=1).astype(np.float32)

    uv1 = project(P1)
    uv2 = project(P2)
    validp = np.zeros(N, bool)
    validp[:m] = True
    res = sim3_solver.sim3_ransac(
        jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1),
        jnp.asarray(uv2), jnp.ones(N), jnp.asarray(validp),
        fx, fy, cx, cy, jax.random.PRNGKey(3), n_hyp=256, fix_scale=True,
        n_valid=np.int32(m),
    )
    # every real match is an inlier of the recovered Sim3
    assert int(res.n_inliers) == m, int(res.n_inliers)
    assert not np.asarray(res.inliers)[m:].any()
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(S.R),
                               atol=1e-3)


def test_pnp_ransac(rng):
    xi = np.array([0.1, 0.2, -0.1, 0.3, -0.2, 0.5], np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    n = 80
    Xw = np.stack([rng.uniform(-10, 10, n), rng.uniform(-5, 5, n),
                   rng.uniform(5, 40, n)], axis=1).astype(np.float32)
    pc = np.asarray(se3.transform_points(T, jnp.asarray(Xw)))
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    uv = np.stack([fx * pc[:, 0] / pc[:, 2] + cx,
                   fy * pc[:, 1] / pc[:, 2] + cy], axis=1).astype(np.float32)
    uv[:15] += rng.uniform(20, 60, (15, 2))  # outliers
    res = pnp.pnp_ransac(
        jnp.asarray(Xw), jnp.asarray(uv), jnp.ones(n), jnp.ones(n, bool),
        fx, fy, cx, cy, jax.random.PRNGKey(1), n_hyp=200,
    )
    assert bool(res.ok)
    err = np.asarray(se3.se3_log(res.T @ se3.inverse(T)))
    assert np.abs(err).max() < 0.02, err
    assert not np.asarray(res.inliers)[:15].any()


def test_epnp_minimal_sample(rng):
    """The EPnP hypothesis solver (PnPsolver.cc compute_pose: beta cases +
    Gauss-Newton + Horn) recovers a usable pose from a 4-point minimal
    sample and a near-exact one from 8 points."""
    xi = np.array([-0.2, 0.1, 0.25, -0.4, 0.6, 0.3], np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    n = 8
    Xw = np.stack([rng.uniform(-8, 8, n), rng.uniform(-4, 4, n),
                   rng.uniform(4, 30, n)], axis=1).astype(np.float32)
    pc = np.asarray(se3.transform_points(T, jnp.asarray(Xw)))
    uv_n = jnp.asarray((pc[:, :2] / pc[:, 2:3]).astype(np.float32))
    T8 = pnp._epnp_pose(jnp.asarray(Xw), uv_n)
    err8 = np.abs(np.asarray(se3.se3_log(T8 @ se3.inverse(T)))).max()
    assert err8 < 5e-3, err8
    T4 = pnp._epnp_pose(jnp.asarray(Xw[:4]), uv_n[:4])
    err4 = np.abs(np.asarray(se3.se3_log(T4 @ se3.inverse(T)))).max()
    assert err4 < 0.5, err4  # minimal samples are rough; RANSAC refines


def test_essential_graph_closes_loop(rng):
    """Chain of 12 keyframes with drift; a loop edge from last to first
    pulls the chain back into consistency."""
    K = 12
    # ground truth: poses on a circle
    gt = []
    for k in range(K):
        ang = 2 * np.pi * k / K
        xi = np.array([0, 0.05 * k, 0, np.cos(ang), np.sin(ang), 0.0],
                      np.float32)
        gt.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    # odometry with accumulated drift in the estimates
    est = [gt[0]]
    for k in range(1, K):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = se3.se3_exp(jnp.asarray(
            (rng.normal(size=6) * np.array([0.01] * 3 + [0.02] * 3))
            .astype(np.float32)))
        est.append(est[-1] @ np.asarray(noise) @ rel)

    e_i, e_j, e_R, e_t, e_s = [], [], [], [], []
    # odometry edges measured from (noisy) relative estimates = exact chain
    for k in range(1, K):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]  # GT relative (loop closure
        # correction target); S_ji maps i=k-1 frame into j=k frame: inv(rel)
        Sji = np.linalg.inv(rel)
        e_i.append(k - 1); e_j.append(k)
        e_R.append(Sji[:3, :3]); e_t.append(Sji[:3, 3]); e_s.append(1.0)
    # loop edge last -> first
    rel = np.linalg.inv(gt[K - 1]) @ gt[0]
    Sji = np.linalg.inv(rel)
    e_i.append(K - 1); e_j.append(0)
    e_R.append(Sji[:3, :3]); e_t.append(Sji[:3, 3]); e_s.append(1.0)

    # vertices: S_cw estimates (inverse of Twc)
    Rs = np.stack([np.linalg.inv(T)[:3, :3] for T in est]).astype(np.float32)
    ts = np.stack([np.linalg.inv(T)[:3, 3] for T in est]).astype(np.float32)
    prob = eg.EGProblem(
        R=jnp.asarray(Rs), t=jnp.asarray(ts), s=jnp.ones(K),
        fixed=jnp.asarray(np.eye(1, K, 0, dtype=bool)[0]),
        e_i=jnp.asarray(np.array(e_i, np.int32)),
        e_j=jnp.asarray(np.array(e_j, np.int32)),
        e_R=jnp.asarray(np.stack(e_R).astype(np.float32)),
        e_t=jnp.asarray(np.stack(e_t).astype(np.float32)),
        e_s=jnp.asarray(np.array(e_s, np.float32)),
        e_valid=jnp.ones(len(e_i), bool),
    )
    R_opt, t_opt, s_opt = eg.optimize_essential_graph(prob, n_iters=15)
    # compare optimized Twc against ground truth
    errs = []
    for k in range(K):
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3] = np.asarray(R_opt[k])
        Tcw[:3, 3] = np.asarray(t_opt[k]) / float(s_opt[k])
        Twc = np.linalg.inv(Tcw)
        errs.append(np.linalg.norm(Twc[:3, 3] - gt[k][:3, 3]))
    drift_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
    assert max(errs) < 0.05, (max(errs), drift_before)
    assert max(errs) < drift_before * 0.5

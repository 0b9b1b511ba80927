import numpy as np
import jax
import jax.numpy as jnp

from iv_slam_tpu.geometry import se3
from iv_slam_tpu.introspection import feature_evaluator as fe
from iv_slam_tpu.introspection import unsupervised as unsup
from iv_slam_tpu.ops import gp


def make_geometry(rng, n=64, noise=0.0):
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    X = np.stack([rng.uniform(-5, 5, n), rng.uniform(-3, 3, n),
                  rng.uniform(5, 30, n)], axis=1).astype(np.float32)
    T_rel = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0.02, -0.04, 0.01, 0.3, 0.1, 0.2], np.float32))))

    def project(P):
        return np.stack([K[0, 0] * P[:, 0] / P[:, 2] + K[0, 2],
                         K[1, 1] * P[:, 1] / P[:, 2] + K[1, 2]], axis=1)

    kp_ref = project(X)
    Xc = X @ T_rel[:3, :3].T + T_rel[:3, 3]
    kp_cur = project(Xc) + noise * rng.normal(size=(n, 2))
    return K, T_rel, kp_ref.astype(np.float32), kp_cur.astype(np.float32)


def test_epipolar_error_zero_for_perfect_matches(rng):
    K, T_rel, kp_ref, kp_cur = make_geometry(rng)
    n = kp_ref.shape[0]
    scores = fe.epipolar_scores(
        jnp.asarray(kp_ref), jnp.asarray(kp_cur), jnp.ones(n),
        jnp.ones(n, bool), jnp.asarray(T_rel), jnp.asarray(K),
        jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.asarray(False),
    )
    raw = np.asarray(scores.raw_err)
    assert (raw >= 0).all()
    assert np.median(raw) < 0.1, np.median(raw)


def test_epipolar_error_flags_bad_matches(rng):
    K, T_rel, kp_ref, kp_cur = make_geometry(rng)
    n = kp_ref.shape[0]
    kp_bad = kp_cur.copy()
    kp_bad[:20] += rng.uniform(15, 40, (20, 2)) * rng.choice([-1, 1], (20, 2))
    scores = fe.epipolar_scores(
        jnp.asarray(kp_ref), jnp.asarray(kp_bad), jnp.ones(n),
        jnp.ones(n, bool), jnp.asarray(T_rel), jnp.asarray(K),
        jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.asarray(False),
    )
    err = np.asarray(scores.norm_err)
    # corrupted matches should score clearly worse than clean ones
    assert np.median(err[:20]) > 3 * np.median(err[20:])
    pct, cnt = fe.bad_match_stats(scores.norm_err)
    assert int(cnt) == n


def test_epipolar_small_baseline_rejected(rng):
    K, _, kp_ref, kp_cur = make_geometry(rng)
    n = kp_ref.shape[0]
    T_tiny = np.eye(4, dtype=np.float32)
    T_tiny[0, 3] = 0.01  # below kMinBaseLine = 0.03
    scores = fe.epipolar_scores(
        jnp.asarray(kp_ref), jnp.asarray(kp_cur), jnp.ones(n),
        jnp.ones(n, bool), jnp.asarray(T_tiny), jnp.asarray(K),
        jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.asarray(False),
    )
    assert (np.asarray(scores.norm_err) == -1).all()


def test_variance_grows_with_pose_uncertainty(rng):
    K, T_rel, kp_ref, kp_cur = make_geometry(rng)
    n = kp_ref.shape[0]
    args = (
        jnp.asarray(kp_ref), jnp.asarray(kp_cur), jnp.ones(n),
        jnp.ones(n, bool), jnp.asarray(T_rel), jnp.asarray(K),
    )
    s_small = fe.epipolar_scores(
        *args, 1e-6 * jnp.eye(3), 1e-6 * jnp.eye(3), jnp.asarray(True)
    )
    s_large = fe.epipolar_scores(
        *args, 1e-2 * jnp.eye(3), 1e-2 * jnp.eye(3), jnp.asarray(True)
    )
    assert float(jnp.mean(s_large.variance)) > float(jnp.mean(s_small.variance))


def test_gp_heatmap_interpolates(rng):
    h, w = 240, 320
    bny, bnx, out_h, out_w = gp.grid_shape(h, w)
    n = 40
    pts = np.stack([rng.uniform(20, 300, n), rng.uniform(20, 220, n)],
                   axis=1).astype(np.float32)
    # left half of image bad (err 1.2), right half good (err 0.1)
    vals = np.where(pts[:, 0] < 160, 1.2, 0.1).astype(np.float32)
    mean, var = gp.gp_grid_predict(
        jnp.asarray(pts), jnp.asarray(vals), jnp.ones(n, bool), bny, bnx
    )
    hm = np.asarray(gp.heatmap_from_grid(mean, out_h, out_w))
    assert hm.shape == (out_h, out_w)
    left = hm[:, : out_w // 3].mean()
    right = hm[:, -out_w // 3:].mean()
    assert left > right + 30, (left, right)
    # variance low near data, high far away (corners without points)
    mask = np.asarray(gp.mask_from_variance(var, out_h, out_w))
    assert set(np.unique(mask)) <= {0, 255}


def test_gp_matches_explicit_inverse(rng):
    """Cholesky path == the reference's explicit K^-1 formulation."""
    n = 24
    pts = rng.uniform(0, 300, (n, 2)).astype(np.float32)
    vals = rng.uniform(0, 1.5, n).astype(np.float32)
    bny, bnx, _, _ = gp.grid_shape(240, 320)
    mean, var = gp.gp_grid_predict(
        jnp.asarray(pts), jnp.asarray(vals), jnp.ones(n, bool), bny, bnx
    )
    # explicit-inverse re-derivation (feature_evaluator.cpp:1935-1976)
    s_f, ell, s_n = 80.0, 100.0, 20.0
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    Km = s_f**2 * np.exp(-d2 / (2 * ell**2)) + s_n**2 * np.eye(n)
    Kinv = np.linalg.inv(Km)
    gx = np.arange(bnx) * 20 + 20.0
    gy = np.arange(bny) * 20 + 20.0
    gxx, gyy = np.meshgrid(gx, gy)
    grid = np.stack([gxx.ravel(), gyy.ravel()], axis=1)
    dg = ((grid[:, None] - pts[None]) ** 2).sum(-1)
    Kv = s_f**2 * np.exp(-dg / (2 * ell**2))
    mean_ref = (Kv @ Kinv @ vals).reshape(bny, bnx)
    var_ref = (s_f**2 - np.einsum("gn,nm,gm->g", Kv, Kinv, Kv)).reshape(bny, bnx)
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=2e-2)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=2.0)


def test_unsupervised_quality_scores():
    chi2 = np.array([0.1, 3.0, 15.0, 0.5, 100.0], np.float32)
    dof = np.array([2, 2, 2, 3, 3], np.int32)
    found = np.array([5, 5, 5, 5, 5], np.int32)
    qual, active = unsup.compute_keypt_qual_scores(chi2, dof, found)
    assert active.all()
    assert qual[0] > 0.9          # tiny chi2 -> good
    assert qual[2] < 0.1          # chi2 >> 99% quantile -> bad
    assert (qual >= -1).all() and (qual <= 1).all()
    # short good tracks pruned
    found2 = np.array([1, 5, 5, 1, 5], np.int32)
    _, active2 = unsup.compute_keypt_qual_scores(chi2, dof, found2)
    assert not active2[0] and active2[1]


def test_tracking_accuracy_gate():
    good = np.zeros(6)
    assert unsup.evaluate_tracking_accuracy(good, None, 1.0)
    bad = np.array([0.1, 0, 0, 0.5, 0, 0])  # large rot+trans error
    assert not unsup.evaluate_tracking_accuracy(bad, None, 1.0)
    # velocity gate: standing still -> not reliable
    still = np.eye(4)
    assert not unsup.evaluate_tracking_accuracy(good, still, 1.0)


def test_rel_pose_cov_from_uncertainty():
    """GetRelativePoseUncertainty semantics (fe.cpp:2008-2063): max over
    the frame range, /4.0 and /0.1 scaling, 95%-bound isotropic covs."""
    unc = np.array([[0.4, 0.02], [0.8, 0.01], [0.2, 0.05]], np.float32)
    out = fe.rel_pose_cov_from_uncertainty(unc, 0, 2)
    assert out is not None
    sigma_w, sigma_t = out
    s_t = (0.8 / 4.0 / fe.SCALE95) ** 2
    s_w = (0.05 / 0.1 / (fe.SCALE95 * np.sqrt(3.0))) ** 2
    np.testing.assert_allclose(np.diag(sigma_t), s_t, rtol=1e-6)
    np.testing.assert_allclose(np.diag(sigma_w), s_w, rtol=1e-6)
    assert fe.rel_pose_cov_from_uncertainty(unc, -1, 2) is None
    assert fe.rel_pose_cov_from_uncertainty(unc, 0, 3) is None


def test_epipolar_scores_with_pose_cov(rng):
    """Supplying a pose covariance must widen the normalization (larger
    variance -> smaller normalized error) and disable the x4 factor."""
    K, T_rel, kp_ref, kp_cur = make_geometry(rng, noise=2.0)
    n = kp_ref.shape[0]
    base = fe.epipolar_scores(
        jnp.asarray(kp_ref), jnp.asarray(kp_cur), jnp.ones(n),
        jnp.ones(n, bool), jnp.asarray(T_rel), jnp.asarray(K),
        jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.asarray(False),
    )
    big = np.eye(3, dtype=np.float32) * 25.0
    cov = fe.epipolar_scores(
        jnp.asarray(kp_ref), jnp.asarray(kp_cur), jnp.ones(n),
        jnp.ones(n, bool), jnp.asarray(T_rel), jnp.asarray(K),
        jnp.asarray(big), jnp.asarray(big), jnp.asarray(True),
    )
    b = np.asarray(base.norm_err)
    c = np.asarray(cov.norm_err)
    sel = (b >= 0) & (c >= 0)
    assert sel.sum() > 30
    # raw errors identical; cov variances strictly larger
    np.testing.assert_allclose(
        np.asarray(base.raw_err)[sel], np.asarray(cov.raw_err)[sel],
        rtol=1e-5,
    )
    assert (np.asarray(cov.variance)[sel]
            > np.asarray(base.variance)[sel]).all()

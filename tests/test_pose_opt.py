import numpy as np
import jax
import jax.numpy as jnp

from iv_slam_tpu.geometry import camera, se3
from iv_slam_tpu.solvers import pose_opt


def make_scene(rng, n=200, stereo_frac=0.7, noise=0.3, outlier_frac=0.1):
    K = camera.Intrinsics(
        jnp.float32(718.0), jnp.float32(718.0), jnp.float32(607.0),
        jnp.float32(185.0), jnp.float32(386.0),
    )
    Xw = np.stack(
        [rng.uniform(-20, 20, n), rng.uniform(-5, 5, n), rng.uniform(5, 60, n)],
        axis=1,
    ).astype(np.float32)
    xi_gt = np.array([0.02, -0.03, 0.01, 0.3, -0.1, 0.5], np.float32)
    T_gt = se3.se3_exp(jnp.asarray(xi_gt))
    pc = se3.transform_points(T_gt, jnp.asarray(Xw))
    obs = np.array(camera.project_stereo(K, pc))
    obs[:, :2] += rng.normal(0, noise, (n, 2))
    is_stereo = rng.uniform(size=n) < stereo_frac
    obs[~is_stereo, 2] = -1.0
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    obs[out_idx, :2] += rng.uniform(10, 40, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return K, jnp.asarray(Xw), jnp.asarray(obs.astype(np.float32)), T_gt, out_idx


def test_jacobian_matches_autodiff(rng):
    K, Xw, obs, T_gt, _ = make_scene(rng, n=16, outlier_frac=0)
    is_stereo = obs[:, 2] >= 0

    def res_fn(xi):
        T = se3.se3_exp(xi) @ T_gt
        e, _ = pose_opt._residuals(T, Xw, obs, is_stereo, K)
        return e

    J_auto = jax.jacfwd(res_fn)(jnp.zeros(6))  # (N, 3, 6)
    _, pc = pose_opt._residuals(T_gt, Xw, obs, is_stereo, K)
    J = pose_opt._jacobian(pc, is_stereo, K)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-2)


def test_pose_opt_converges_and_classifies(rng):
    K, Xw, obs, T_gt, out_idx = make_scene(rng)
    n = Xw.shape[0]
    # perturb initial pose
    xi0 = np.array([0.01, 0.02, -0.015, 0.2, 0.1, -0.3], np.float32)
    T0 = se3.se3_exp(jnp.asarray(xi0)) @ T_gt
    inv_sigma2 = jnp.ones(n, jnp.float32)
    qual = jnp.ones(n, jnp.float32)
    valid = jnp.ones(n, bool)
    res = jax.jit(pose_opt.pose_optimization, static_argnames=())(
        T0, Xw, obs, inv_sigma2, qual, valid, K
    )
    err = np.asarray(se3.se3_log(res.T @ se3.inverse(T_gt)))
    assert np.abs(err[:3]).max() < 2e-4, err   # rotation (rad)
    assert np.abs(err[3:]).max() < 5e-3, err   # translation (m)
    inlier = np.asarray(res.inlier)
    assert not inlier[out_idx].any()
    assert inlier.sum() > 0.8 * (n - len(out_idx))


def test_huber_weight_quality_scaling():
    # quality scales the Huber delta: delta' = delta * qual
    # (Optimizer.cc:340-342). A residual inside the nominal band but outside
    # the scaled band gets down-weighted by delta'/|e|.
    chi2 = jnp.asarray([4.0])
    active = jnp.asarray([True])
    w_full = pose_opt._huber_w(chi2, jnp.asarray([5.991]), active)
    assert float(w_full[0]) == 1.0
    qual = 0.1
    w_scaled = pose_opt._huber_w(chi2, jnp.asarray([5.991 * qual**2]), active)
    np.testing.assert_allclose(
        float(w_scaled[0]), np.sqrt(5.991 * qual**2 / 4.0), rtol=1e-5
    )
    # with the kernel off the weight is 1 regardless
    w_off = pose_opt._huber_w(chi2, jnp.asarray([5.991 * qual**2]),
                              jnp.asarray([False]))
    assert float(w_off[0]) == 1.0


def test_pose_opt_quality_downweights(rng):
    # single robust LM round (kernel on): a 1.5 px bias on half the points
    # stays inside the chi2 inlier gate, so the quality-scaled Huber delta
    # is the only defense — low-quality points should drag the pose less
    K, Xw, obs, T_gt, _ = make_scene(rng, n=300, noise=0.05, outlier_frac=0.0)
    n = Xw.shape[0]
    obs_np = np.array(obs)
    bad = np.arange(n) < n // 2
    obs_np[bad, :2] += 1.5
    obs_j = jnp.asarray(obs_np)
    ones = jnp.ones(n, jnp.float32)
    valid = jnp.ones(n, bool)
    is_stereo = obs_j[:, 2] >= 0
    delta_base_sq = jnp.where(is_stereo, 7.815, 5.991)

    def run(qual):
        delta_sq = delta_base_sq * qual * qual
        return pose_opt._lm_round(
            T_gt, Xw, obs_j, ones, delta_sq, is_stereo, valid, K,
            kernel_on=True, n_iters=10,
        )

    T_u = run(ones)
    T_w = run(jnp.where(jnp.asarray(bad), 0.05, 1.0))
    err_u = np.linalg.norm(np.asarray(se3.se3_log(T_u @ se3.inverse(T_gt))))
    err_w = np.linalg.norm(np.asarray(se3.se3_log(T_w @ se3.inverse(T_gt))))
    assert err_w < err_u * 0.8, (err_u, err_w)

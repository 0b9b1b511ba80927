import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

pytestmark = pytest.mark.smoke

from iv_slam_tpu.geometry import se3, camera


def random_se3(rng, n=16):
    # keep |omega| < pi so log is the principal value and roundtrips
    w = rng.normal(size=(n, 3))
    w = w / np.linalg.norm(w, axis=1, keepdims=True) * rng.uniform(0, 3.0, (n, 1))
    v = rng.normal(size=(n, 3)) * 2.0
    return np.concatenate([w, v], axis=1).astype(np.float32)


def test_so3_exp_matches_scipy(rng):
    w = (rng.normal(size=(32, 3)) * 1.5).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = (rng.normal(size=(32, 3))).astype(np.float32)
    w = np.clip(w, -1.5, 1.5)
    w2 = np.asarray(se3.so3_log(se3.so3_exp(jnp.asarray(w))))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_se3_log_large_angle_consistency(rng):
    # beyond pi, log returns the principal value; exp(log(T)) must equal T
    w = rng.normal(size=(16, 3)) * 2.0
    v = rng.normal(size=(16, 3)) * 2.0
    xi = np.concatenate([w, v], axis=1).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    T2 = se3.se3_exp(se3.se3_log(T))
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=2e-3)


def test_so3_small_angle():
    w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(se3.so3_log(R))))


def test_se3_exp_log_roundtrip(rng):
    xi = random_se3(rng)
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-3)


def test_se3_inverse(rng):
    xi = random_se3(rng)
    T = se3.se3_exp(jnp.asarray(xi))
    eye = np.asarray(T @ se3.inverse(T))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-5)


def test_quat_roundtrip(rng):
    w = (rng.normal(size=(32, 3))).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # scipy cross-check (scipy uses [x, y, z, w] too)
    q_ref = Rotation.from_matrix(np.asarray(R)).as_quat()
    q_ref *= np.where(q_ref[:, 3:4] < 0, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-5)


def test_transform_points(rng):
    xi = random_se3(rng, 1)[0]
    T = se3.se3_exp(jnp.asarray(xi))
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(se3.transform_points(T, jnp.asarray(pts)))
    Tn = np.asarray(T)
    ref = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_project_unproject_roundtrip(rng):
    K = camera.Intrinsics(
        jnp.float32(718.0), jnp.float32(718.0), jnp.float32(607.0),
        jnp.float32(185.0), jnp.float32(386.0),
    )
    depth = rng.uniform(1.0, 50.0, size=(64,)).astype(np.float32)
    uv = np.stack(
        [rng.uniform(0, 1200, 64), rng.uniform(0, 370, 64)], axis=-1
    ).astype(np.float32)
    pts = camera.backproject(K, jnp.asarray(uv), jnp.asarray(depth))
    uv2 = np.asarray(camera.project(K, pts))
    np.testing.assert_allclose(uv2, uv, atol=1e-3)
    obs = np.asarray(camera.project_stereo(K, pts))
    disp = obs[:, 0] - obs[:, 2]
    np.testing.assert_allclose(disp, 386.0 / depth, rtol=1e-5)


def test_projection_jacobians_match_autodiff(rng):
    K = camera.Intrinsics(
        jnp.float32(700.0), jnp.float32(710.0), jnp.float32(600.0),
        jnp.float32(180.0), jnp.float32(380.0),
    )
    pts = jnp.asarray(
        np.stack(
            [rng.normal(size=8) * 5, rng.normal(size=8) * 5,
             rng.uniform(2, 40, 8)], axis=-1
        ).astype(np.float32)
    )
    J = camera.proj_jacobian_stereo(K, pts)
    J_auto = jax.vmap(jax.jacfwd(lambda p: camera.project_stereo(K, p)))(pts)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-3)

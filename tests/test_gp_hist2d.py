import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.smoke

from iv_slam_tpu.ops import gp
from iv_slam_tpu.introspection import feature_evaluator as fe
from iv_slam_tpu.geometry import se3


def test_hist2d_heatmap_means(rng):
    bny, bnx, out_h, out_w = gp.grid_shape(240, 320)
    pts = np.array([[30.0, 30.0], [31.0, 31.0], [250.0, 200.0]], np.float32)
    vals = np.array([1.0, 2.0, 0.4], np.float32)
    grid = np.asarray(
        gp.hist2d_heatmap(
            jnp.asarray(pts), jnp.asarray(vals), jnp.ones(3, bool), bny, bnx
        )
    )
    # window at origin (0,0) size 40 contains the first two points
    assert abs(grid[0, 0] - 1.5) < 1e-5
    # an empty window defaults to err_min = 0
    assert grid[3, 10] == 0.0
    # windows are overlapping (stride 20 < size 40): the (0, 1)-origin
    # window [20..60) also contains both points
    assert abs(grid[0, 1] - 1.5) < 1e-5


def test_gt_reprojection_errors(rng):
    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], np.float32)
    T_rel = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0.01, -0.02, 0.005, 0.2, 0.1, 0.05], np.float32))))
    n = 32
    depth = rng.uniform(4, 20, n).astype(np.float32)
    kp_ref = np.stack(
        [rng.uniform(40, 280, n), rng.uniform(40, 200, n)], 1
    ).astype(np.float32)
    # perfect matches: project through the GT transform
    x = (kp_ref[:, 0] - 160) * depth / 400
    y = (kp_ref[:, 1] - 120) * depth / 400
    p = np.stack([x, y, depth], 1) @ T_rel[:3, :3].T + T_rel[:3, 3]
    kp_cur = np.stack(
        [400 * p[:, 0] / p[:, 2] + 160, 400 * p[:, 1] / p[:, 2] + 120], 1
    ).astype(np.float32)
    err = np.asarray(
        fe.gt_reprojection_errors(
            jnp.asarray(kp_ref), jnp.asarray(kp_cur), jnp.asarray(depth),
            jnp.ones(n, bool), jnp.asarray(T_rel), jnp.asarray(K),
        )
    )
    assert (err >= 0).all()
    assert err.max() < 1e-2
    # corrupt half: errors should reflect the pixel offset
    kp_bad = kp_cur.copy()
    kp_bad[:16, 0] += 5.0
    err2 = np.asarray(
        fe.gt_reprojection_errors(
            jnp.asarray(kp_ref), jnp.asarray(kp_bad), jnp.asarray(depth),
            jnp.ones(n, bool), jnp.asarray(T_rel), jnp.asarray(K),
        )
    )
    assert np.allclose(err2[:16], 5.0, atol=0.01)
    # missing depth -> -1
    d2 = depth.copy()
    d2[0] = -1.0
    err3 = np.asarray(
        fe.gt_reprojection_errors(
            jnp.asarray(kp_ref), jnp.asarray(kp_cur), jnp.asarray(d2),
            jnp.ones(n, bool), jnp.asarray(T_rel), jnp.asarray(K),
        )
    )
    assert err3[0] == -1.0

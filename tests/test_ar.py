"""AR demo analogue (slam/ar.py): plane RANSAC + cube overlay.

Reference semantics: ViewerAR::DetectPlane (ViewerAR.cc:392-509) and
DrawCube/DrawPlane rendered headlessly.
"""

import numpy as np
import pytest

from iv_slam_tpu.slam import ar

from synth_world import PlaneWorld, camera_pose


def test_detect_plane_recovers_ground_plane():
    rng = np.random.default_rng(3)
    # noisy points on z=0 + outliers floating above
    n_in, n_out = 300, 60
    pts = np.concatenate([
        np.stack([rng.uniform(-5, 5, n_in), rng.uniform(-5, 5, n_in),
                  rng.normal(0, 0.01, n_in)], axis=1),
        np.stack([rng.uniform(-5, 5, n_out), rng.uniform(-5, 5, n_out),
                  rng.uniform(0.5, 3.0, n_out)], axis=1),
    ])
    obs = np.full(len(pts), 6)
    Tcw = np.linalg.inv(camera_pose((0, 0), height=10.0)).astype(np.float32)
    plane = ar.detect_plane(pts, obs, Tcw, rng=rng)
    assert plane is not None
    # normal is +-z; oriented toward the camera at z=+10 -> +z
    assert abs(plane.normal[2]) > 0.99
    assert plane.normal[2] > 0
    assert abs(plane.origin[2]) < 0.05
    # the inlier set excludes (almost all) the floating outliers
    assert (plane.inliers < n_in).mean() > 0.95


def test_detect_plane_gates():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3))
    Tcw = np.eye(4, dtype=np.float32)
    # too few well-observed points -> None (reference: N < 50 returns NULL)
    assert ar.detect_plane(pts, np.full(100, 2), Tcw, rng=rng) is None
    assert ar.detect_plane(pts[:10], np.full(10, 9), Tcw, rng=rng) is None


def test_cube_projection_consistency():
    """Cube corners projected through two GT poses shift like the plane
    texture does: a pure x-translation of the camera moves the projection
    by -fx*dx/z."""
    rng = np.random.default_rng(1)
    pts = np.stack([rng.uniform(-4, 4, 200), rng.uniform(-4, 4, 200),
                    np.zeros(200)], axis=1)
    obs = np.full(200, 6)
    Twc0 = camera_pose((0, 0), height=10.0)
    Tcw0 = np.linalg.inv(Twc0).astype(np.float32)
    plane = ar.detect_plane(pts, obs, Tcw0, rng=rng)
    assert plane is not None
    corners = ar.cube_corners_world(plane, size=1.0)
    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], np.float32)

    p0, f0 = ar.project_points(K, Tcw0, corners)
    assert f0.all()
    dx = 0.4
    Twc1 = camera_pose((dx, 0), height=10.0)
    Tcw1 = np.linalg.inv(Twc1).astype(np.float32)
    p1, f1 = ar.project_points(K, Tcw1, corners)
    assert f1.all()
    # base corners sit on the plane at depth 10: du = -fx * dx / 10
    du = p1[:4, 0] - p0[:4, 0]
    assert np.allclose(du, -400.0 * dx / 10.0, atol=1e-3)
    # top corners are 1m closer to the camera -> bigger shift magnitude
    du_top = p1[4:, 0] - p0[4:, 0]
    assert (np.abs(du_top) > np.abs(du)).all()


def test_overlay_draws_on_frame():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    world = PlaneWorld(rng)
    Twc = camera_pose((0, 0), height=10.0)
    img = world.render(Twc)
    Tcw = np.linalg.inv(Twc).astype(np.float32)
    pts = np.stack([rng.uniform(-1, 1, 120), rng.uniform(-1, 1, 120),
                    np.zeros(120)], axis=1)
    plane = ar.detect_plane(pts, np.full(120, 6), Tcw, rng=rng)
    out = ar.draw_ar_overlay(img, Tcw, world.K, plane, cube_size=1.0)
    assert out.shape == (world.h, world.w, 3)
    # the overlay actually changed pixels (colored lines on a gray image)
    gray3 = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    assert (out != gray3).any()
    # and the change is colored (not equal across channels everywhere)
    diff = out.astype(int) - gray3.astype(int)
    changed = np.abs(diff).sum(axis=2) > 0
    assert changed.sum() > 50


def test_ar_renderer_with_slam_map():
    """End-to-end: track a few synthetic frames, then the renderer fits the
    ground plane from the real map store."""
    from iv_slam_tpu.config import CameraConfig, Config, ORBConfig
    from iv_slam_tpu.slam.system import System

    rng = np.random.default_rng(7)
    world = PlaneWorld(rng)
    cfg = Config()
    cfg.camera = CameraConfig(
        fx=400.0, fy=400.0, cx=160.0, cy=120.0, bf=world.bf,
        width=world.w, height=world.h, fps=10.0, th_depth=35.0,
    )
    cfg.orb = ORBConfig(n_features=600, n_levels=4, max_keypoints=1024)
    system = System(cfg, world.h, world.w)
    renderer = ar.ARRenderer(world.K, cube_size=1.0)
    Tcw = None
    for i in range(4):
        Twc = camera_pose((i * 0.15, 0), height=10.0)
        left, right = world.render_stereo(Twc)
        Tcw = system.track_stereo(left, right, i * 0.1)
    assert Tcw is not None
    # the map store's points lie on the ground plane; min_obs in the map
    # after 4 frames is small, so relax the observation gate
    m = system.tracking.map
    n = m.n_points
    alive = m.pt_alive[:n]
    pts = m.pt_pos[:n][alive]
    obs = np.array([len(m.pt_obs[i]) for i in np.nonzero(alive)[0]])
    plane = ar.detect_plane(pts, obs, Tcw, rng=rng, min_obs=0)
    assert plane is not None
    assert abs(plane.normal[2]) > 0.97
    renderer.plane = plane
    out = renderer.render(left, Tcw)
    assert out.shape == (world.h, world.w, 3)

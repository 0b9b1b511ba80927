"""Synthetic stereo sequence renderer for end-to-end SLAM tests.

A textured plane (world z = 0) viewed by a downward-looking stereo rig.
Rendering is an exact homography warp, so ground-truth poses are exact and
stereo geometry is consistent with the pinhole model.
"""

import cv2
import numpy as np


class PlaneWorld:
    def __init__(self, rng, tex_size=4096, res=80.0, fx=400.0, fy=400.0,
                 cx=160.0, cy=120.0, w=320, h=240, baseline=0.5):
        tex = rng.uniform(0, 255, size=(tex_size, tex_size)).astype(np.float32)
        for _ in range(6000):
            y, x = rng.integers(10, tex_size - 16, 2)
            tex[y:y + 8, x:x + 8] = rng.uniform(0, 255)
        # low-pass the texture below Nyquist: descriptors must survive the
        # sub-pixel resampling of camera motion (raw noise decorrelates)
        tex = cv2.GaussianBlur(tex, (9, 9), 2.0)
        self.tex = np.clip(tex, 0, 255).astype(np.uint8)
        self.res = res  # texture pixels per world meter
        self.K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        self.Kinv = np.linalg.inv(self.K)
        self.w, self.h = w, h
        self.baseline = baseline
        self.bf = baseline * fx

    def render(self, Twc: np.ndarray) -> np.ndarray:
        """Render the camera view for camera-to-world pose Twc."""
        R = Twc[:3, :3]
        C = Twc[:3, 3]
        uu, vv = np.meshgrid(np.arange(self.w), np.arange(self.h))
        rays = np.stack([uu, vv, np.ones_like(uu)], axis=-1).astype(np.float32)
        rays = rays @ self.Kinv.T @ R.T  # world-frame ray directions
        lam = -C[2] / rays[..., 2]
        X = C[None, None, :] + lam[..., None] * rays
        tx = (X[..., 0] * self.res + self.tex.shape[1] / 2).astype(np.float32)
        ty = (X[..., 1] * self.res + self.tex.shape[0] / 2).astype(np.float32)
        return cv2.remap(self.tex, tx, ty, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_WRAP)

    def render_stereo(self, Twc: np.ndarray):
        left = self.render(Twc)
        Twc_r = Twc.copy()
        # right camera displaced along the camera x-axis
        Twc_r[:3, 3] = Twc[:3, 3] + Twc[:3, :3] @ np.array(
            [self.baseline, 0, 0], np.float32
        )
        right = self.render(Twc_r)
        return left, right

    def render_depth(self, Twc: np.ndarray) -> np.ndarray:
        """Exact per-pixel depth (camera-frame z) of the plane."""
        R = Twc[:3, :3]
        C = Twc[:3, 3]
        uu, vv = np.meshgrid(np.arange(self.w), np.arange(self.h))
        rays_cam = np.stack(
            [uu, vv, np.ones_like(uu)], axis=-1
        ).astype(np.float32) @ self.Kinv.T
        rays_w = rays_cam @ R.T
        lam = -C[2] / rays_w[..., 2]
        # depth = z-component in camera frame of the hit point
        return (lam * rays_cam[..., 2]).astype(np.float32)


class DistinctPlaneWorld(PlaneWorld):
    """Plane world whose texture varies by REGION: a macro-grid of cells,
    each stamped with a cell-specific pattern family (bar angle, stamp
    size, intensity palette). A uniform random texture is self-similar —
    every viewpoint produces nearly the same BoW word histogram, so
    DetectLoop's minimum-score + 3-consistency gates never fire
    (LoopClosing.cc:108-234 expects real scenes, where places LOOK
    different). Region-distinct texture gives place recognition an actual
    signal, letting a revisit trajectory exercise DetectLoop ->
    ComputeSim3 -> CorrectLoop end to end."""

    def __init__(self, rng, cells=8, **kw):
        super().__init__(rng, **kw)
        tex = self.tex.astype(np.float32)
        ts = tex.shape[0]
        cell = ts // cells
        for cy in range(cells):
            for cx in range(cells):
                y0, x0 = cy * cell, cx * cell
                # cell-specific pattern family
                ang = float(rng.uniform(0, np.pi))
                size = int(rng.integers(8, 28))
                lo, hi = sorted(rng.uniform(0, 255, 2))
                ca, sa = np.cos(ang), np.sin(ang)
                for _ in range(140):
                    yy = int(rng.integers(0, cell - size - 1))
                    xx = int(rng.integers(0, cell - size - 1))
                    val = float(rng.uniform(lo, hi))
                    # rotated bar stamp: length `size`, width size//3
                    ll = size
                    wwd = max(size // 3, 2)
                    ys, xs = np.mgrid[0:size, 0:size]
                    u = (xs - size / 2) * ca + (ys - size / 2) * sa
                    v = -(xs - size / 2) * sa + (ys - size / 2) * ca
                    m = (np.abs(u) < ll / 2) & (np.abs(v) < wwd / 2)
                    patch = tex[y0 + yy:y0 + yy + size,
                                x0 + xx:x0 + xx + size]
                    patch[m] = val
        tex = cv2.GaussianBlur(tex, (5, 5), 1.2)
        self.tex = np.clip(tex, 0, 255).astype(np.uint8)


class DistinctTerrainWorld(DistinctPlaneWorld):
    """Region-distinct ground plane PLUS scattered elevated platforms:
    the loop-closing bench world. Region-distinct texture gives BoW place
    recognition a real signal (see DistinctPlaneWorld); the platforms add
    the 3D structure loop CORRECTION needs — on a single nadir plane every
    matched landmark is coplanar, the candidate Sim3 estimated from the
    thin revisit-overlap strip is ill-conditioned, and an accepted
    correction injects noise (r5 root-cause of "closed loop made ATE
    worse": geometry, not gating). KITTI streets — the scenes the
    reference closes loops on (stereo_kitti.cc) — are 3D; so is this.

    Platforms default to a ring matching bench.py's radius-6 revisit
    circle (centers between the camera's waypoints, heights 1.5-4.5 m
    below the 10 m flight height), each textured from its own offset into
    the region-distinct ground texture so elevation never costs
    distinctiveness."""

    def __init__(self, rng, platforms=None, ring_center=(0.0, 6.0),
                 ring_radius=6.0, **kw):
        super().__init__(rng, **kw)
        if platforms is None:
            platforms = []
            cx0, cy0 = ring_center
            for k in range(8):
                ang = (k + 0.5) * 2.0 * np.pi / 8
                r = float(rng.uniform(0.75, 1.25)) * ring_radius
                px = cx0 + r * np.sin(ang)
                py = cy0 - r * np.cos(ang)
                half = float(rng.uniform(1.2, 2.4))
                z = float(rng.uniform(1.5, 4.5))
                platforms.append((px - half, px + half,
                                  py - half, py + half, z))
        self.platforms = platforms
        # per-platform texture offset (texture pixels): distinct cells
        ts = self.tex.shape[0]
        self.plat_off = [
            (float(rng.uniform(0, ts)), float(rng.uniform(0, ts)))
            for _ in platforms
        ]

    def _platform_hits(self, Twc):
        """Per-platform (hit mask, lam, world hit points) for the pixel
        grid; rays in both camera and world frames ride along."""
        R = Twc[:3, :3]
        C = Twc[:3, 3]
        uu, vv = np.meshgrid(np.arange(self.w), np.arange(self.h))
        rays_cam = np.stack(
            [uu, vv, np.ones_like(uu)], axis=-1
        ).astype(np.float32) @ self.Kinv.T
        rays_w = rays_cam @ R.T
        out = []
        for (x0, x1, y0, y1, z) in self.platforms:
            lam = (z - C[2]) / rays_w[..., 2]
            X = C[None, None, :] + lam[..., None] * rays_w
            hit = (
                (lam > 0)
                & (X[..., 0] >= x0) & (X[..., 0] <= x1)
                & (X[..., 1] >= y0) & (X[..., 1] <= y1)
            )
            out.append((hit, lam, X))
        return rays_cam, out

    def render(self, Twc: np.ndarray) -> np.ndarray:
        img = super().render(Twc).astype(np.float32)
        _, hits = self._platform_hits(Twc)
        for (hit, _lam, X), (ox, oy) in zip(hits, self.plat_off):
            if not hit.any():
                continue
            tx = (X[..., 0] * self.res + ox).astype(np.float32) \
                % self.tex.shape[1]
            ty = (X[..., 1] * self.res + oy).astype(np.float32) \
                % self.tex.shape[0]
            top = cv2.remap(self.tex, tx, ty, cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_WRAP)
            img = np.where(hit, top, img)
        return np.clip(img, 0, 255).astype(np.uint8)

    def render_depth(self, Twc: np.ndarray) -> np.ndarray:
        R = Twc[:3, :3]
        C = Twc[:3, 3]
        rays_cam, hits = self._platform_hits(Twc)
        rays_w = rays_cam @ R.T
        lam = -C[2] / rays_w[..., 2]  # ground
        for (hit, lam_p, _X) in hits:
            # platforms sit between camera and ground: closer hit wins
            lam = np.where(hit & (lam_p < lam), lam_p, lam)
        return (lam * rays_cam[..., 2]).astype(np.float32)


class TwoPlaneWorld(PlaneWorld):
    """Ground plane (z = 0) plus an elevated square platform (z = height2)
    — non-planar structure so monocular H/F model selection has parallax."""

    def __init__(self, rng, height2=4.0, region=(-2.0, 2.0, -2.0, 2.0),
                 **kw):
        super().__init__(rng, **kw)
        tex2 = rng.uniform(0, 255, size=(1024, 1024)).astype(np.float32)
        import cv2

        for _ in range(900):
            y, x = rng.integers(10, 1008, 2)
            tex2[y:y + 6, x:x + 6] = rng.uniform(0, 255)
        tex2 = cv2.GaussianBlur(tex2, (9, 9), 2.0)
        self.tex2 = np.clip(tex2, 0, 255).astype(np.uint8)
        self.height2 = height2
        self.region = region

    def render(self, Twc: np.ndarray) -> np.ndarray:
        import cv2

        base = super().render(Twc)
        R = Twc[:3, :3]
        C = Twc[:3, 3]
        uu, vv = np.meshgrid(np.arange(self.w), np.arange(self.h))
        rays = np.stack([uu, vv, np.ones_like(uu)], axis=-1).astype(
            np.float32
        ) @ self.Kinv.T @ R.T
        lam2 = (self.height2 - C[2]) / rays[..., 2]
        X2 = C[None, None, :] + lam2[..., None] * rays
        x0, x1, y0, y1 = self.region
        hit = (
            (lam2 > 0)
            & (X2[..., 0] >= x0) & (X2[..., 0] <= x1)
            & (X2[..., 1] >= y0) & (X2[..., 1] <= y1)
        )
        tx = ((X2[..., 0] - x0) / (x1 - x0) * 1000).astype(np.float32)
        ty = ((X2[..., 1] - y0) / (y1 - y0) * 1000).astype(np.float32)
        img2 = cv2.remap(self.tex2, tx, ty, cv2.INTER_LINEAR)
        return np.where(hit, img2, base).astype(np.uint8)

    def render_depth(self, Twc: np.ndarray) -> np.ndarray:
        R = Twc[:3, :3]
        C = Twc[:3, 3]
        uu, vv = np.meshgrid(np.arange(self.w), np.arange(self.h))
        rays_cam = np.stack(
            [uu, vv, np.ones_like(uu)], axis=-1
        ).astype(np.float32) @ self.Kinv.T
        rays_w = rays_cam @ R.T
        lam1 = -C[2] / rays_w[..., 2]
        lam2 = (self.height2 - C[2]) / rays_w[..., 2]
        X2 = C[None, None, :] + lam2[..., None] * rays_w
        x0, x1, y0, y1 = self.region
        hit = (
            (lam2 > 0)
            & (X2[..., 0] >= x0) & (X2[..., 0] <= x1)
            & (X2[..., 1] >= y0) & (X2[..., 1] <= y1)
        )
        lam = np.where(hit, lam2, lam1)
        return (lam * rays_cam[..., 2]).astype(np.float32)


class ShimmerWorld(PlaneWorld):
    """Plane world with a temporally-inconsistent (per-frame reseeded)
    noise band in a FIXED image region — the synthetic analogue of the
    failure sources IV-SLAM learns (CoRL 2020: reflections, glare, shadow
    boundaries; feature_evaluator.cpp scores exactly these as bad).

    Corners detected inside the band have descriptors that decorrelate
    between frames and between the stereo pair, producing systematically
    wrong stereo depths and frame-to-frame mismatches. Because the band is
    fixed in IMAGE space (a windshield-glare analogue), an introspection
    model can learn it from images, and weighted extraction + quality-
    weighted pose optimization should route around it.

    `region` is (x0, x1, y0, y1) as fractions of image width/height.
    """

    def __init__(self, rng, region=(0.55, 1.0, 0.0, 1.0), strength=0.85,
                 **kw):
        super().__init__(rng, **kw)
        self.region = region
        self.strength = strength
        self._noise_rng = np.random.default_rng(rng.integers(1 << 31))
        self._frame_noise = None  # shared by the L/R renders of one frame

    def new_frame(self):
        """Advance the shimmer field. Called per RENDER, so the left and
        right images of a stereo pair see INDEPENDENT noise: SAD
        refinement inside the band locks onto random correspondences and
        produces plausible-but-wrong depths — the poisoned map points the
        introspection model exists to discount (vs shared noise, which
        yields zero-disparity matches the depth gate simply rejects)."""
        x0, x1, y0, y1 = self._pixel_region()
        noise = self._noise_rng.uniform(
            0, 255, size=(y1 - y0, x1 - x0)
        ).astype(np.float32)
        import cv2

        self._frame_noise = cv2.GaussianBlur(noise, (5, 5), 1.0)

    def _pixel_region(self):
        fx0, fx1, fy0, fy1 = self.region
        return (int(fx0 * self.w), int(fx1 * self.w),
                int(fy0 * self.h), int(fy1 * self.h))

    def render(self, Twc):
        img = super().render(Twc)
        self.new_frame()
        x0, x1, y0, y1 = self._pixel_region()
        band = img[y0:y1, x0:x1].astype(np.float32)
        mixed = (1.0 - self.strength) * band + self.strength * self._frame_noise
        img = img.copy()
        img[y0:y1, x0:x1] = np.clip(mixed, 0, 255).astype(np.uint8)
        return img

    def bad_region_mask(self):
        """(H, W) bool mask of the degraded band (evaluation ground truth)."""
        x0, x1, y0, y1 = self._pixel_region()
        m = np.zeros((self.h, self.w), bool)
        m[y0:y1, x0:x1] = True
        return m


class ReflectionWorld(PlaneWorld):
    """Plane world with a STATIC image-space texture band — the
    windshield-reflection / lens-glare case that motivates IV-SLAM
    (CoRL 2020). The band's corners sit at fixed pixel coordinates every
    frame, so frame-to-frame matching on them is self-consistent with a
    NON-MOVING camera: the pose optimizer cannot reject them by residual
    (they agree with a biased pose), and the estimate drags toward zero
    motion. The right image's band is shifted by a fixed disparity so
    stereo assigns the phantom structure a plausible mid-range depth.
    Ground-truth-referenced epipolar scoring flags exactly these
    features, so a trained introspection model can suppress the band."""

    def __init__(self, rng, region=(0.55, 1.0, 0.1, 0.9), alpha=0.65,
                 disparity=6.0, **kw):
        super().__init__(rng, **kw)
        self.region = region
        self.alpha = alpha
        self.disparity = disparity
        x0, x1, y0, y1 = self._pixel_region()
        tex = rng.uniform(0, 255, size=(y1 - y0, x1 - x0 + 64)).astype(
            np.float32
        )
        for _ in range(250):
            yy = rng.integers(0, max(y1 - y0 - 7, 1))
            xx = rng.integers(0, x1 - x0 + 57)
            tex[yy:yy + 6, xx:xx + 6] = rng.uniform(0, 255)
        import cv2

        self._band = cv2.GaussianBlur(tex, (7, 7), 1.5)
        self._right_view = False

    def _pixel_region(self):
        fx0, fx1, fy0, fy1 = self.region
        return (int(fx0 * self.w), int(fx1 * self.w),
                int(fy0 * self.h), int(fy1 * self.h))

    def render_stereo(self, Twc):
        self._right_view = False
        left = self.render(Twc)
        Twc_r = Twc.copy()
        Twc_r[:3, 3] = Twc[:3, 3] + Twc[:3, :3] @ np.array(
            [self.baseline, 0, 0], np.float32
        )
        self._right_view = True
        right = self.render(Twc_r)
        self._right_view = False
        return left, right

    def render(self, Twc):
        img = super().render(Twc).astype(np.float32)
        x0, x1, y0, y1 = self._pixel_region()
        off = int(round(self.disparity)) if self._right_view else 0
        band = self._band[:, off:off + (x1 - x0)]
        img[y0:y1, x0:x1] = (
            (1.0 - self.alpha) * img[y0:y1, x0:x1] + self.alpha * band
        )
        return np.clip(img, 0, 255).astype(np.uint8)

    def bad_region_mask(self):
        x0, x1, y0, y1 = self._pixel_region()
        m = np.zeros((self.h, self.w), bool)
        m[y0:y1, x0:x1] = True
        return m


def camera_pose(t_xyz, height=10.0, yaw=0.0):
    """Camera at t_xyz + altitude, optical axis looking down at the plane
    (camera z toward -world z), x aligned with world x."""
    Twc = np.eye(4, dtype=np.float32)
    cy, sy = np.cos(yaw), np.sin(yaw)
    # camera axes in world coords: x right, y forward(-ish), z down to plane
    Rwc = np.array(
        [[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, -1.0]], np.float32
    )
    # flip y to keep det(R) = +1 (right-handed)
    Rwc[:, 1] *= -1
    Twc[:3, :3] = Rwc
    Twc[:3, 3] = [t_xyz[0], t_xyz[1], height]
    return Twc


def make_sequence(rng, n_frames=20, step=0.08):
    world = PlaneWorld(rng)
    frames = []
    gt = []
    for i in range(n_frames):
        t = np.array([i * step, 0.02 * np.sin(i * 0.4), 0.0], np.float32)
        Twc = camera_pose(t, height=10.0, yaw=0.02 * np.sin(i * 0.3))
        left, right = world.render_stereo(Twc)
        frames.append((left, right))
        gt.append(Twc)
    return world, frames, gt

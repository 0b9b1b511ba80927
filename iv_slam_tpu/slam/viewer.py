"""Headless visualization (src/{Viewer,FrameDrawer,MapDrawer}.cc roles).

The reference drives a Pangolin GL window with headless + save-to-file
modes (Viewer.cc:56-70, YAML Viewer.HeadlessMode/SaveFramesToFile/
SaveMapDrawingsToFile). The TPU runtime is headless by construction; this
module implements the save-to-file modes: current-frame keypoint/match
overlays (FrameDrawer) with quality coloring in training mode, and
top-down map renders with trajectory + GT overlay (MapDrawer,
map_drawer_visualize_gt_pose).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class FrameDrawer:
    """Keypoint/match overlay images (src/FrameDrawer.cc)."""

    def __init__(self, out_dir: Optional[str] = None):
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

    def draw(self, img_gray: np.ndarray, frame, state_name: str = "OK"):
        import cv2

        vis = cv2.cvtColor(img_gray, cv2.COLOR_GRAY2BGR)
        matched = frame.map_pt >= 0
        n_matched = 0
        for i in np.nonzero(frame.valid)[0]:
            x, y = frame.xy[i]
            pt = (int(round(x)), int(round(y)))
            if matched[i]:
                # quality-colored in training mode: green good, red bad
                q = float(frame.qual_score[i])
                color = (0, int(255 * max(q, 0)), int(255 * (1 - max(q, 0))))
                cv2.rectangle(
                    vis, (pt[0] - 5, pt[1] - 5), (pt[0] + 5, pt[1] + 5), color
                )
                cv2.circle(vis, pt, 2, color, -1)
                n_matched += 1
            else:
                cv2.circle(vis, pt, 1, (160, 160, 160), -1)
        cv2.putText(
            vis, f"{state_name}  matches: {n_matched}",
            (10, vis.shape[0] - 10), cv2.FONT_HERSHEY_PLAIN, 1.0,
            (255, 255, 255), 1,
        )
        if self.out_dir:
            cv2.imwrite(
                os.path.join(self.out_dir, f"frame_{frame.frame_id:06d}.png"),
                vis,
            )
        return vis


def draw_heatmap_overlay(
    img_gray: np.ndarray,
    heatmap: np.ndarray,
    good_for_training: bool,
    keypoints_xy: Optional[np.ndarray] = None,
    errors: Optional[np.ndarray] = None,
    out_path: Optional[str] = None,
):
    """Training-data debug visualization (feature_evaluator.cpp:1057-1114):
    heatmap blended over the image, green/red dot for the good-for-training
    verdict, optional per-keypoint error coloring."""
    import cv2

    h, w = heatmap.shape
    base = cv2.cvtColor(img_gray[:h, :w], cv2.COLOR_GRAY2BGR)
    color = cv2.applyColorMap(heatmap, cv2.COLORMAP_JET)
    vis = cv2.addWeighted(base, 0.5, color, 0.5, 0)
    dot = (0, 255, 0) if good_for_training else (0, 0, 255)
    cv2.circle(vis, (24, 24), 12, dot, -1)
    if keypoints_xy is not None and errors is not None:
        emax = max(float(np.max(errors)), 1e-6)
        for (x, y), e in zip(keypoints_xy, errors):
            if e < 0:
                continue
            c = int(255 * min(e / emax, 1.0))
            cv2.circle(vis, (int(x), int(y)), 2, (0, 255 - c, c), -1)
    if out_path:
        cv2.imwrite(out_path, vis)
    return vis


class MapDrawer:
    """Top-down map/trajectory renders (src/MapDrawer.cc). Optional GT
    trajectory overlay (gflag map_drawer_visualize_gt_pose)."""

    def __init__(self, out_dir: Optional[str] = None, size: int = 800):
        self.out_dir = out_dir
        self.size = size
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

    def draw(self, map_store, trajectory_twc, gt_twc=None, frame_id=0,
             show_points=True, show_keyframes=True, show_graph=False,
             follow_camera=False, follow_extent=40.0):
        """Layer flags mirror the reference Viewer menu booleans
        (menuShowPoints/menuShowKeyFrames/menuShowGraph/menuFollowCamera,
        src/Viewer.cc:96-100 -> MapDrawer::DrawMapPoints/DrawKeyFrames).
        follow_camera centers a fixed `follow_extent`-meter window on the
        newest trajectory point instead of fitting the whole map."""
        import cv2

        vis = np.full((self.size, self.size, 3), 20, np.uint8)
        pts = map_store.pt_pos[: map_store.n_points][
            map_store.pt_alive[: map_store.n_points]
        ]
        traj = np.array([T[:3, 3] for T in trajectory_twc]) if trajectory_twc \
            else np.zeros((0, 3))
        allxz = np.concatenate(
            [pts[:, [0, 2]], traj[:, [0, 2]]]
            if len(traj) else [pts[:, [0, 2]]]
        ) if len(pts) else traj[:, [0, 2]]
        if len(allxz) == 0:
            return vis
        if follow_camera and len(traj):
            center = traj[-1][[0, 2]]
            lo = center - follow_extent / 2.0
            hi = center + follow_extent / 2.0
        else:
            lo = allxz.min(axis=0) - 1
            hi = allxz.max(axis=0) + 1
        scale = (self.size - 40) / max(float((hi - lo).max()), 1e-6)

        def to_px(xz):
            p = (xz - lo) * scale + 20
            return int(p[0]), self.size - int(p[1]) - 1

        if show_points:
            for p in pts[:, [0, 2]]:
                cv2.circle(vis, to_px(p), 1, (180, 180, 180), -1)
        kf_ids = [k for k in range(map_store.n_keyframes)
                  if map_store.kf_alive[k]]
        centers = {k: map_store.kf_camera_center(k) for k in kf_ids} \
            if (show_keyframes or show_graph) else {}
        if show_graph:
            # covisibility graph (weight >= 100), MapDrawer::DrawKeyFrames
            # bDrawGraph branch
            for k in kf_ids:
                for nb, w in map_store.covisible_keyframes(k):
                    if nb > k and w >= 100 and nb in centers:
                        cv2.line(vis, to_px(centers[k][[0, 2]]),
                                 to_px(centers[nb][[0, 2]]),
                                 (120, 200, 120), 1)
        if show_keyframes:
            for k in kf_ids:
                cv2.rectangle(
                    vis,
                    tuple(np.subtract(to_px(centers[k][[0, 2]]), 2)),
                    tuple(np.add(to_px(centers[k][[0, 2]]), 2)),
                    (255, 160, 0), 1,
                )
        for a, b in zip(traj[:-1], traj[1:]):
            cv2.line(vis, to_px(a[[0, 2]]), to_px(b[[0, 2]]), (0, 220, 0), 1)
        if gt_twc is not None:
            gt = np.array([T[:3, 3] for T in gt_twc])
            for a, b in zip(gt[:-1], gt[1:]):
                cv2.line(
                    vis, to_px(a[[0, 2]]), to_px(b[[0, 2]]), (0, 120, 255), 1
                )
        if self.out_dir:
            cv2.imwrite(
                os.path.join(self.out_dir, f"map_{frame_id:06d}.png"), vis
            )
        return vis

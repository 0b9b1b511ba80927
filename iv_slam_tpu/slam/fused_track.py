"""Single-dispatch fused tracking step.

The classic per-frame loop (Tracking.cc:513-880) interleaves host logic with
four device calls (motion-model search, pose LM, local-map search, pose LM),
each paying a full link round-trip. This program fuses the whole estimation
chain into ONE jitted dispatch against the device-resident map mirror
(device_map.py):

  motion-model projection search (narrow -> conditional wide window)
  -> 4x10-round quality-weighted pose LM -> local search over ALL live map
  points (frustum + scale-window gated; a superset of the reference's
  covisibility-local set — the dense Hamming matrix makes the full map
  affordable) -> pose LM again.

Host code afterwards only reads back small assignment/pose arrays and keeps
its bookkeeping unchanged. Used by Tracking when cfg.system.fused_tracking
is set; the multi-dispatch path remains as the semantics reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera
from ..ops import match as match_ops
from ..solvers import pose_opt


class FusedResult(NamedTuple):
    T: jnp.ndarray              # (4, 4) final pose
    assign_map: jnp.ndarray     # (M,) device-map slot per keypoint or -1
    inlier: jnp.ndarray         # (M,) bool (final pose-opt inliers)
    chi2: jnp.ndarray           # (M,)
    n_motion: jnp.ndarray       # () motion-model matches
    n_final: jnp.ndarray        # () final inlier count


class FusedTracker:
    def __init__(self, cfg, height: int, width: int):
        self.cfg = cfg
        self.K = camera.Intrinsics.from_config(cfg.camera)
        import numpy as np

        sf = cfg.orb.scale_factors()
        self.scale_factors = jnp.asarray(sf)
        self.inv_level_sigma2 = jnp.asarray((1.0 / (sf * sf)).astype(np.float32))
        self.log_scale = jnp.float32(np.log(cfg.orb.scale_factor))
        self.height = height
        self.width = width
        self._step_fn = self._build_step()
        self._step = jax.jit(self._step_fn)

        def step_chained(
            cur_xy, cur_oct, cur_angle, cur_desc, cur_ur, cur_valid,
            cur_qual, cur_depth,
            last_xy, last_oct, last_angle, last_valid,
            last_pt_ids, T_i, T_im1,
            *map_views,
        ):
            # motion model on device: T_pred = (T_i · T_{i-1}^-1) · T_i —
            # the pose chain never touches the host (chained tracking)
            T_pred = (T_i @ jnp.linalg.inv(T_im1)) @ T_i
            return self._step_fn(
                cur_xy, cur_oct, cur_angle, cur_desc, cur_ur, cur_valid,
                cur_qual, cur_depth,
                last_xy, last_oct, last_angle, last_valid,
                last_pt_ids, T_pred, T_i, *map_views,
            )

        self._step_chained = step_chained

    def _build_step(self):
        cfg = self.cfg
        cam = cfg.camera
        K = self.K
        swm = cfg.matcher.search_window_multiplier
        nn_local = 0.8 * cfg.matcher.nn_ratio_multiplier

        def step(
            # current frame (device arrays from the frontend)
            cur_xy, cur_oct, cur_angle, cur_desc, cur_ur, cur_valid, cur_qual,
            cur_depth,
            # last frame
            last_xy, last_oct, last_angle, last_valid,
            last_pt_ids,            # (N,) int32 map slots or -1
            T_pred, T_last,
            # device map tables
            map_pos, map_desc, map_normal, map_mind, map_maxd, map_qual,
            map_valid,
        ):
            cap = map_pos.shape[0]
            ids = jnp.maximum(last_pt_ids, 0)
            pt_pos = map_pos[ids]
            pt_desc = map_desc[ids]
            # slots >= cap can only appear transiently after a map reset
            # (jnp gather clips, so gate them out explicitly)
            pt_ok = (map_valid[ids] & (last_pt_ids >= 0)
                     & (last_pt_ids < cap) & last_valid)

            def motion_search(th):
                return match_ops.search_by_projection_last_frame(
                    cur_xy, cur_oct, cur_angle, cur_desc, cur_ur, cur_valid,
                    pt_pos, pt_desc, last_oct, last_angle, pt_ok,
                    T_pred, T_last,
                    jnp.float32(cam.fx), jnp.float32(cam.fy),
                    jnp.float32(cam.cx), jnp.float32(cam.cy),
                    jnp.float32(cam.bf), jnp.float32(cam.baseline),
                    jnp.float32(self.width), jnp.float32(self.height),
                    self.scale_factors, th,
                )

            assign1, n1 = motion_search(jnp.float32(7.0 * swm))
            # widen the window when matches are scarce (Tracking.cc:1333-1343)
            assign1, n1 = jax.lax.cond(
                n1 < 20,
                lambda: motion_search(jnp.float32(14.0 * swm)),
                lambda: (assign1, n1),
            )
            # keypoint -> map slot from the motion stage
            slot1 = jnp.where(assign1 >= 0, last_pt_ids[jnp.maximum(assign1, 0)], -1)

            # pose-LM edge compaction: the frame carries N (2048) keypoint
            # slots but only the tracked matches (~500-1200) are edges;
            # running the 4x10 LM rounds over a compacted POSE_CAP table
            # halves the per-iteration J/H work (the two LM stages
            # measured 2 x 25 ms of the fused step's ~112 ms unfused
            # parts, tools/bench_fused_parts.py). k-th-set-bit gather +
            # rank scatter-back keeps results bit-aligned to the full
            # (N,) view; an overflow (> POSE_CAP active edges) ships in
            # the result pack so the host can warn — never silent.
            # 1024 covers small/mid feature configs; at a 2048-keypoint
            # frame capacity the KITTI-sized bench tracks 1050-1250 live
            # edges (r5 measured), so the cap steps to 1536 there — still
            # 25% off the full table's LM work, with no dropped edges
            N_kp = cur_xy.shape[0]
            POSE_CAP = 1024 if N_kp <= 1536 else 1536
            obs_full = jnp.concatenate([cur_xy, cur_ur[:, None]], axis=1)
            inv_s2_full = self.inv_level_sigma2[cur_oct]

            def run_pose_opt(T0, slots):
                has = slots >= 0
                if N_kp <= POSE_CAP:
                    sl = jnp.maximum(slots, 0)
                    qual = (map_qual[sl] if cfg.iv.propagate_keyptqual
                            else cur_qual)
                    res = pose_opt.pose_optimization(
                        T0, map_pos[sl], obs_full, inv_s2_full, qual,
                        has & map_valid[sl], K,
                        n_rounds=cfg.iv.optimizer_pose_opt_iter_count,
                    )
                    return res, jnp.int32(0)
                cum = jnp.cumsum(has.astype(jnp.int32))
                sel = jnp.searchsorted(
                    cum, jnp.arange(1, POSE_CAP + 1, dtype=jnp.int32),
                    side="left",
                ).astype(jnp.int32)
                sel = jnp.minimum(sel, N_kp - 1)
                sel_ok = jnp.arange(POSE_CAP) < cum[-1]
                sl = jnp.maximum(slots[sel], 0)
                qual = (map_qual[sl] if cfg.iv.propagate_keyptqual
                        else cur_qual[sel])
                res = pose_opt.pose_optimization(
                    T0, map_pos[sl], obs_full[sel], inv_s2_full[sel],
                    qual, sel_ok & map_valid[sl], K,
                    n_rounds=cfg.iv.optimizer_pose_opt_iter_count,
                )
                # rank scatter-back to the (N,) keypoint view
                rank = jnp.clip(cum - 1, 0, POSE_CAP - 1)
                in_cap = has & ((cum - 1) < POSE_CAP)
                res = res._replace(
                    inlier=in_cap & res.inlier[rank],
                    chi2=jnp.where(in_cap, res.chi2[rank], 0.0),
                )
                overflow = jnp.maximum(cum[-1] - POSE_CAP, 0)
                return res, overflow

            res1, ovf1 = run_pose_opt(T_pred, slot1)
            slot1_in = jnp.where(res1.inlier, slot1, -1)

            # local search: at large live rungs, compact the map table to
            # the frustum-gated survivors first — only ~1-3k of 16k live
            # points can match a forward-motion frame, and the matcher's
            # (P, N) pair work dominates the fused step's device time.
            # The (P,) gate is exactly the matcher's own isInFrustum, so
            # results are identical while gated count <= LOCAL_CAP (the
            # count ships in the result pack; the host warns on overflow
            # — never silent).
            LOCAL_CAP = 4096
            P = map_pos.shape[0]
            fxj, fyj = jnp.float32(cam.fx), jnp.float32(cam.fy)
            cxj, cyj = jnp.float32(cam.cx), jnp.float32(cam.cy)
            wj, hj = jnp.float32(self.width), jnp.float32(self.height)
            gate = match_ops.frustum_gate(
                map_pos, map_normal, map_mind, map_maxd, map_valid,
                res1.T, fxj, fyj, cxj, cyj, wj, hj,
            )
            n_gate = jnp.sum(gate.astype(jnp.int32))
            if P > LOCAL_CAP:
                # k-th-set-bit compaction (cumsum + vectorized binary
                # search): scatter-free — TPU lowers non-unique scatters
                # to serial loops
                cum = jnp.cumsum(gate.astype(jnp.int32))
                sel = jnp.searchsorted(
                    cum, jnp.arange(1, LOCAL_CAP + 1, dtype=jnp.int32),
                    side="left",
                ).astype(jnp.int32)
                sel = jnp.minimum(sel, P - 1)
                sel_ok = jnp.arange(LOCAL_CAP) < cum[-1]
                s_pos = map_pos[sel]
                s_desc = map_desc[sel]
                s_normal = map_normal[sel]
                s_mind = map_mind[sel]
                s_maxd = map_maxd[sel]
                s_valid = map_valid[sel] & sel_ok
            else:
                sel = None
                s_pos, s_desc, s_normal = map_pos, map_desc, map_normal
                s_mind, s_maxd, s_valid = map_mind, map_maxd, map_valid

            assign2, _ = match_ops.search_by_projection_local_map(
                cur_xy, cur_oct, cur_desc, cur_ur, cur_valid,
                slot1_in >= 0,
                s_pos, s_desc, s_normal, s_mind, s_maxd, s_valid,
                res1.T,
                fxj, fyj, cxj, cyj, jnp.float32(cam.bf),
                wj, hj,
                self.scale_factors, self.log_scale,
                jnp.float32(1.0 * swm), jnp.float32(nn_local),
            )
            if sel is not None:
                # map compacted-row indices back to full-table slots
                assign2 = jnp.where(
                    assign2 >= 0, sel[jnp.maximum(assign2, 0)], -1
                )
            merged = jnp.where(slot1_in >= 0, slot1_in, assign2)
            res2, ovf2 = run_pose_opt(res1.T, merged)
            final_assign = jnp.where(res2.inlier, merged, -1)
            res = FusedResult(
                T=res2.T,
                assign_map=final_assign,
                inlier=res2.inlier,
                chi2=res2.chi2,
                n_motion=n1,
                n_final=res2.n_inliers,
            )
            # every host-bound value as ONE flat array (the tunneled
            # runtime pays one RPC per materialized array): frame views
            # (deferred frontend) + tracking results + pose + counters.
            pack = jnp.stack(
                [cur_xy[:, 0], cur_xy[:, 1],
                 cur_oct.astype(jnp.float32),
                 cur_valid.astype(jnp.float32),
                 cur_ur, cur_depth, cur_qual,
                 final_assign.astype(jnp.float32),
                 res2.inlier.astype(jnp.float32),
                 res2.chi2], axis=1,
            )                                            # (N, 10)
            small = jnp.concatenate(
                [res2.T.reshape(16),
                 jnp.stack([n1.astype(jnp.float32),
                            res2.n_inliers.astype(jnp.float32),
                            n_gate.astype(jnp.float32),
                            jnp.maximum(ovf1, ovf2).astype(jnp.float32)])]
            )                                            # (20,)
            flat = jnp.concatenate([pack.reshape(-1), small])
            return res, flat

        return step

    def track(self, frame, last_frame, last_pt_ids, T_pred, dmap):
        """Returns (FusedResult of device arrays, flat host-pack array).

        The three always-host inputs (last frame's point ids + the two
        poses) ride ONE packed upload (utils/argpack.py) instead of three
        RPCs; frame views stay device arrays (deferred frontend output)."""
        import numpy as np

        from ..utils import argpack

        return argpack.call_packed(
            self._step,
            frame.kp.xy, frame.kp.octave, frame.kp.angle, frame.kp.desc,
            jnp.asarray(frame.u_right), frame.kp.valid,
            jnp.asarray(frame.qual_score), jnp.asarray(frame.depth),
            last_frame.kp.xy, last_frame.kp.octave, last_frame.kp.angle,
            last_frame.kp.valid,
            last_pt_ids.astype(np.int32),
            np.asarray(T_pred, np.float32),
            np.asarray(last_frame.pose, np.float32),
            *dmap.live_views(),
        )

    def track_chained(self, frame, last_frame, last_assign_dev, T_dev,
                      T_prev_dev, dmap):
        """Speculative dispatch for frame n+1 from frame n's DEVICE
        results: every argument is device-resident (the assignment map and
        pose chain come from the previous FusedResult), so the dispatch
        carries no host upload and no host sync — the whole estimation
        chain pipelines on device while the host consumes results one
        frame behind (Tracking._track_stereo_chained)."""
        from ..utils import argpack

        return argpack.call_packed(
            self._step_chained,
            frame.kp.xy, frame.kp.octave, frame.kp.angle, frame.kp.desc,
            jnp.asarray(frame.u_right), frame.kp.valid,
            jnp.asarray(frame.qual_score), jnp.asarray(frame.depth),
            last_frame.kp.xy, last_frame.kp.octave, last_frame.kp.angle,
            last_frame.kp.valid,
            last_assign_dev, T_dev, T_prev_dev,
            *dmap.live_views(),
        )

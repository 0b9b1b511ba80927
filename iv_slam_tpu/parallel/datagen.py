"""Multi-chip training-data generation (sharded datagen fast path).

The reference generates FCN training data by riding the sequential SLAM
loop (Tracking.cc:687-775 -> feature_evaluator.cpp EvaluateFeatures ->
GenerateImageQualityHeatmapGP -> dataset_creator), one session per
process (scripts/run_stereo_jackal_train_data_gen.bash loops sessions).
That shape is inherently serial: every frame's scoring waits on the
tracker's correspondences.

With ground-truth poses available — which datagen REQUIRES — the
prev-frame training modes (TrainingMode kCompareAgainstPrevFrame*,
feature_evaluator.h:68-78) are frame-pair-local: the reference keypoint
lives in the immediately preceding frame, and the scored quantity is the
GT-relative-pose normalized epipolar error. This module exploits that
locality to run the WHOLE datagen pipeline data-parallel over a jax
mesh:

  frontend (pyramids + ORB x2 + stereo)        — pointwise per frame
  GT-guided projection matching prev -> cur    — pointwise per pair
  normalized epipolar scoring (fe.epipolar_scores)
  GP heatmap + variance mask (ops/gp)          — pointwise per pair

as ONE pjit'd program per batch, sharded over 'dp'. A dp=8 mesh scores
8 frame pairs per program instance; batches overlap by one frame so
every consecutive pair is covered. Output artifacts use the exact
reference dataset schema (dataset_creator.h:39-57) via DatasetCreator.

Deviation note (documented on purpose): correspondences come from
GT-guided projection matching (ORBmatcher::SearchByProjection semantics
with the GT pose) rather than from the tracker's map-point
associations. The sequential path (introspection/datagen.py) remains
the reference-exact mode; this is the TPU-scale fast path for bulk
dataset generation.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..geometry import camera as camera_mod
from ..introspection import feature_evaluator as fe
from ..introspection.dataset_creator import DatasetCreator
from ..ops import gp
from ..ops import match as match_ops
from ..slam.frame import StereoFrontend
from .replay import make_replay_mesh


class ShardedDatagen:
    def __init__(
        self,
        cfg: Config,
        height: int,
        width: int,
        mesh: Optional[Mesh] = None,
        out_path: Optional[str] = None,
        score_cap: int = 512,
    ):
        self.cfg = cfg
        self.h, self.w = height, width
        self.mesh = mesh or make_replay_mesh()
        self.frontend = StereoFrontend(cfg, height, width)
        self.creator = DatasetCreator(out_path) if out_path else None
        self.n_saved = 0
        self.score_cap = score_cap
        cam = cfg.camera
        sf = np.asarray(cfg.orb.scale_factors(), np.float32)
        self.bny, self.bnx, self.out_h, self.out_w = gp.grid_shape(
            height, width, cfg.gp.bin_size, cfg.gp.bin_stride
        )
        K = cam.K().astype(np.float32)

        def pair_fn(cur, prev, Twc_cur, Twc_prev):
            """Score one (prev -> cur) pair; all inputs device arrays."""
            f32 = jnp.float32
            # prev keypoints with stereo depth -> world points via GT pose
            z = prev["depth"]
            has_d = prev["valid"] & (z > 0)
            xyp = prev["xy"]
            pc = jnp.stack(
                [(xyp[:, 0] - cam.cx) * z / cam.fx,
                 (xyp[:, 1] - cam.cy) * z / cam.fy, z], axis=1,
            )
            Xw = pc @ Twc_prev[:3, :3].T + Twc_prev[:3, 3]
            Tcw_cur = jnp.linalg.inv(Twc_cur)
            Tcw_prev = jnp.linalg.inv(Twc_prev)
            assign, _n = match_ops.search_by_projection_last_frame(
                cur["xy"], cur["octave"], cur["angle"], cur["desc"],
                cur["u_right"], cur["valid"],
                Xw, prev["desc"], prev["octave"], prev["angle"], has_d,
                Tcw_cur, Tcw_prev,
                f32(cam.fx), f32(cam.fy), f32(cam.cx), f32(cam.cy),
                f32(cam.bf), f32(cam.baseline),
                f32(width), f32(height),
                jnp.asarray(sf), f32(7.0),
            )
            # matched pairs, capped to score_cap in keypoint order (the
            # sequential path caps identically via cfg.gp.max_train_points)
            matched = assign >= 0
            order = jnp.argsort(~matched)          # matched first, stable
            sc = min(self.score_cap, int(assign.shape[0]))
            sel = order[:sc]
            sel_ok = matched[sel]
            j = jnp.maximum(assign[sel], 0)
            kp_cur = cur["xy"][sel]
            kp_ref = xyp[j]
            sig2 = (jnp.asarray(sf) ** 2)[cur["octave"][sel]]
            T_rel = Tcw_cur @ Twc_prev             # ref-cam -> cur-cam (GT)
            scores = fe.epipolar_scores(
                kp_ref, kp_cur, sig2, sel_ok,
                jnp.broadcast_to(T_rel, (sc, 4, 4)),
                jnp.asarray(K),
                jnp.zeros((3, 3), f32), jnp.zeros((3, 3), f32),
                jnp.asarray(False),
            )
            err = scores.norm_err
            ok = sel_ok & (err >= 0)
            pct, cnt = fe.bad_match_stats(
                jnp.where(ok, err, -1.0), fe.BAD_ERR_THRESH
            )
            mean, var = gp.gp_grid_predict(
                jnp.where(ok[:, None], kp_cur, 0.0),
                jnp.where(ok, err, 0.0), ok,
                self.bny, self.bnx, cfg.gp.bin_size, cfg.gp.bin_stride,
                cfg.gp.sigma_f, cfg.gp.length_scale, cfg.gp.sigma_n,
            )
            heat = gp.heatmap_from_grid(mean, self.out_h, self.out_w)
            mask = gp.mask_from_variance(var, self.out_h, self.out_w)
            return dict(
                heatmap=heat, mask=mask, pct=pct, cnt=cnt,
                err=jnp.where(ok, err, -1.0), sel=sel, kp=kp_cur,
            )

        data = NamedSharding(self.mesh, P("dp"))

        def batch_fn(L, R, Twc):
            # stage 1: frontend per frame (B frames, sharded over dp)
            def fe_one(il, ir):
                kl, _kr, u_right, depth, _q, _pack = self.frontend._step(
                    il, ir, None
                )
                return dict(
                    xy=kl.xy, octave=kl.octave, angle=kl.angle,
                    desc=kl.desc, valid=kl.valid, u_right=u_right,
                    depth=depth,
                )
            fr = jax.vmap(fe_one)(L, R)
            # stage 2: pairs (i-1 -> i) for i in 1..B-1 (gathers across
            # the dp shards become XLA collective-permutes over ICI)
            cur = jax.tree.map(lambda a: a[1:], fr)
            prev = jax.tree.map(lambda a: a[:-1], fr)
            return jax.vmap(pair_fn)(cur, prev, Twc[1:], Twc[:-1])

        self._fn = jax.jit(
            batch_fn, in_shardings=(data, data, data),
        )

    def process_session(
        self,
        frames: List,                 # [(left, right)] uint8
        gt_poses: List[np.ndarray],   # [(4, 4) Twc]
        img_names: Optional[List[str]] = None,
        batch: Optional[int] = None,
    ) -> dict:
        """Run datagen over a whole session in dp-sharded batches
        (overlapping by one frame so every consecutive pair is scored).
        Returns summary stats; writes dataset artifacts when out_path was
        given."""
        n_dev = len(self.mesh.devices.ravel())
        b = batch or max(2 * n_dev, 8)
        b = ((b + n_dev - 1) // n_dev) * n_dev  # dp-divisible frame axis
        names = img_names or [f"{i:06d}.png" for i in range(len(frames))]
        n_good = 0
        n_pairs = 0
        pcts = []
        start = 0
        while start + 1 < len(frames):
            stop = min(start + b, len(frames))
            idx = list(range(start, stop))
            # pad the batch to a fixed size so one program shape serves
            # the whole session
            while len(idx) < b:
                idx.append(idx[-1])
            L = np.stack([frames[i][0] for i in idx])
            R = np.stack([frames[i][1] for i in idx])
            Twc = np.stack([gt_poses[i] for i in idx]).astype(np.float32)
            out = self._fn(jnp.asarray(L), jnp.asarray(R),
                           jnp.asarray(Twc))
            got = jax.device_get(
                (out["heatmap"], out["mask"], out["pct"], out["cnt"],
                 out["err"], out["sel"], out["kp"])
            )
            heat, mask, pct, cnt, err, sel, kp = got
            for row in range(b - 1):
                i_cur = idx[row + 1]
                if idx[row] == i_cur:
                    continue  # padded tail (self-pair)
                n_pairs += 1
                pcts.append(float(pct[row]))
                good = fe.frame_good_for_training(
                    float(pct[row]), int(cnt[row])
                )
                if self.creator is not None and good:
                    self.creator.save_bad_region_heatmap(
                        names[i_cur], heat[row])
                    self.creator.save_bad_region_heatmap_mask(
                        names[i_cur], mask[row])
                    ok = err[row] >= 0
                    self.creator.append_keypoints(
                        kp[row][ok], np.zeros(int(ok.sum()), np.float32),
                        np.zeros(int(ok.sum()), np.float32), err[row][ok],
                    )
                    n_good += 1
            start = stop - 1  # overlap one frame
        if self.creator is not None:
            self.creator.save_to_file()
            self.n_saved = n_good
        return dict(
            n_pairs=n_pairs, n_good=n_good,
            mean_bad_pct=float(np.mean(pcts)) if pcts else float("nan"),
        )

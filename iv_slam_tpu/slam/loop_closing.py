"""Loop detection + correction (src/LoopClosing.cc, inline variant).

Pipeline per new keyframe (LoopClosing::Run, 57-106):

  detect_loop (108): BoW candidates above the covisible min-score, gated by
      3 temporally-consistent candidate groups;
  compute_sim3 (236): BoW matches -> Sim3 RANSAC -> Sim3 refinement ->
      projection search; accept at >= 40 matches (reference thresholds:
      >= 20 BoW matches to try, >= 20 Sim3 inliers to refine);
  correct_loop (407): propagate the corrected Sim3 through the covisible
      neighborhood, move their map points, fuse duplicates against the loop
      side, then optimize the essential graph.

The reference runs this on a thread and spawns an async global-BA thread;
here it runs inline after local mapping (the driver configuration is
single-threaded), with global BA available as an explicit call.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import bow_match
from ..solvers import sim3_solver, sim3_opt, essential_graph as eg
from .keyframe_db import KeyFrameDatabase
from .vocabulary import Vocabulary, l1_score

COVISIBILITY_CONSISTENCY_TH = 3


class LoopClosing:
    def __init__(self, cfg: Config, map_store, voc: Vocabulary,
                 kfdb: KeyFrameDatabase):
        self.cfg = cfg
        self.map = map_store
        self.voc = voc
        self.kfdb = kfdb
        self.last_loop_kf = -1
        self.consistent_groups: List[Tuple[set, int]] = []
        # per-kf cached vocabulary data
        self.kf_nodes: Dict[int, np.ndarray] = {}
        self.kf_bow: Dict[int, dict] = {}
        self.n_loops_closed = 0
        # optional per-stage wall-clock tracing (tools/bench_loop_closing)
        self.stage_timer = None
        # persistent loop-closure edges (KeyFrame::GetLoopEdges): past
        # closures stay as normal edges in later essential graphs
        self.loop_edges: set = set()
        # deferred global BA (the reference's GBA thread): dispatched at
        # CorrectLoop, merged at the next keyframe event
        self.pending_gba = None
        self.async_gba = bool(getattr(cfg.system, "async_gba", True))

    # ------------------------------------------------------------- helpers

    # vocabularies at ORBvoc scale (~1M leaves) pay ~50-70 ms of cache-
    # hostile host tree descent per transform; route those through the
    # device descent (ops/bow.py, tree resident in HBM) instead
    DEVICE_TRANSFORM_MIN_NODES = 200_000

    def _ensure_bow(self, kf_id: int):
        if kf_id in self.kf_bow:
            return
        frame = self.map.kf_frames[kf_id]
        # ONE tree descent per keyframe feeds both the BowVector and the
        # FeatureVector (DBoW2 transform() computes both in one walk)
        device = len(self.voc.node_desc) >= self.DEVICE_TRANSFORM_MIN_NODES
        leaf = self.voc.transform_nodes(frame.desc, frame.valid,
                                        device=device)
        self.kf_bow[kf_id] = self.voc.bow_vector(frame.desc, nodes=leaf)
        self.kf_nodes[kf_id] = self.voc.feature_nodes(frame.desc, nodes=leaf)

    # ----------------------------------------------------------- main loop

    def _stage(self, name: str):
        import contextlib

        if self.stage_timer is None:
            return contextlib.nullcontext()
        return self.stage_timer.time(name)

    def process_keyframe(self, kf_id: int, fix_scale: bool = True) -> bool:
        """Returns True if a loop was detected and corrected."""
        with self._stage("lc_bow"):
            self._ensure_bow(kf_id)
            self.kfdb.add(kf_id, self.kf_bow[kf_id])
        if self.map.n_keyframes < 11 or kf_id < self.last_loop_kf + 10:
            return False
        with self._stage("lc_detect"):
            candidates = self._detect_loop(kf_id)
        if not candidates:
            return False
        with self._stage("lc_sim3"):
            match = self._compute_sim3(kf_id, candidates, fix_scale)
        if match is None:
            return False
        loop_kf, S_corr, matched = match
        with self._stage("lc_correct"):
            self._correct_loop(kf_id, loop_kf, S_corr, matched,
                               fix_scale=fix_scale)
        self.last_loop_kf = kf_id
        self.n_loops_closed += 1
        return True

    # ------------------------------------------------------------- detect

    def _detect_loop(self, kf_id: int) -> List[int]:
        bow = self.kf_bow[kf_id]
        connected = {k for k, _ in self.map.covisible_keyframes(kf_id)}
        min_score = 1.0
        for nb in connected:
            self._ensure_bow(nb)
            min_score = min(min_score, l1_score(bow, self.kf_bow[nb]))
        cands = self.kfdb.detect_loop_candidates(
            kf_id, bow, min_score, connected, self.map
        )
        if not cands:
            self.consistent_groups = []
            return []
        # temporal consistency over 3 detections (LoopClosing.cc:161-225)
        enough: List[int] = []
        new_groups: List[Tuple[set, int]] = []
        for cand in cands:
            group = {cand} | {
                k for k, _ in self.map.covisible_keyframes(cand)
            }
            consistent_for = 0
            for prev_group, prev_count in self.consistent_groups:
                if group & prev_group:
                    consistent_for = max(consistent_for, prev_count + 1)
            new_groups.append((group, consistent_for))
            if consistent_for >= COVISIBILITY_CONSISTENCY_TH:
                enough.append(cand)
        self.consistent_groups = new_groups
        return enough

    # -------------------------------------------------------- compute sim3

    def _compute_sim3(
        self, kf_id: int, candidates: List[int], fix_scale: bool
    ) -> Optional[Tuple[int, "np.ndarray"]]:
        cur = self.map.kf_frames[kf_id]
        cam = self.cfg.camera
        sf2 = (self.map.scale_factors ** 2)
        for cand in candidates:
            self._ensure_bow(cand)
            cf = self.map.kf_frames[cand]
            cur_has = cur.map_pt >= 0
            cand_has = cf.map_pt >= 0
            assign, n = bow_match.search_by_bow(
                jnp.asarray(cf.desc), jnp.asarray(self.kf_nodes[cand]),
                jnp.asarray(cf.angle), jnp.asarray(cand_has & cf.valid),
                jnp.asarray(cur.desc), jnp.asarray(self.kf_nodes[kf_id]),
                jnp.asarray(cur.angle), jnp.asarray(cur_has & cur.valid),
                jnp.float32(0.75),
            )
            if int(n) < 20:
                continue
            assign = np.asarray(assign)
            ai = np.nonzero(assign >= 0)[0]
            bi = assign[ai]
            # matched map point positions in each camera frame
            p_cand_w = self.map.pt_pos[cf.map_pt[ai]]
            p_cur_w = self.map.pt_pos[cur.map_pt[bi]]
            Tc_cand = self.map.kf_pose[cand]
            Tc_cur = self.map.kf_pose[kf_id]
            P1 = p_cand_w @ Tc_cand[:3, :3].T + Tc_cand[:3, 3]
            P2 = p_cur_w @ Tc_cur[:3, :3].T + Tc_cur[:3, 3]
            uv1 = cf.xy[ai]
            uv2 = cur.xy[bi]
            sig1 = sf2[cf.octave[ai]]
            sig2 = sf2[cur.octave[bi]]
            m = len(ai)
            # FIXED-shape solver calls: padding the m BoW matches to the
            # frame capacity keeps one compiled sim3_ransac/optimize_sim3
            # program per session — the data-dependent (m,) shapes
            # compiled a fresh remote program per loop event (~10 s each,
            # most of the measured 11.7 s ComputeSim3)
            N = cur.desc.shape[0]

            def _pad(a, tail=()):
                out = np.zeros((N,) + tail, np.float32)
                out[:m] = a
                return out

            sig_max = np.ones(N, np.float32)
            sig_max[:m] = np.maximum(sig1, sig2)
            validp = np.zeros(N, bool)
            validp[:m] = True
            # hypothesis triples drawn from the real-match prefix [0, m)
            # only (Sim3Solver samples mvAllIndices — actual matches);
            # m rides as a traced scalar so the compiled shape is fixed
            res = sim3_solver.sim3_ransac(
                jnp.asarray(_pad(P1, (3,))), jnp.asarray(_pad(P2, (3,))),
                jnp.asarray(_pad(uv1, (2,))), jnp.asarray(_pad(uv2, (2,))),
                jnp.asarray(sig_max),
                jnp.asarray(validp),
                cam.fx, cam.fy, cam.cx, cam.cy,
                jax.random.PRNGKey(kf_id), n_hyp=256, fix_scale=fix_scale,
                n_valid=np.int32(m),
            )
            if int(res.n_inliers) < 20:
                continue
            # extend matches through the Sim3 window search
            # (ORBmatcher::SearchBySim3 — reference requires >= 40 total
            # matches around the refined Sim3, LoopClosing.cc:236-404)
            sR = np.asarray(res.R) * float(res.s)
            cand_free = np.asarray(cand_has & cf.valid)
            cur_free = np.asarray(cur_has & cur.valid)
            P1_all = (
                self.map.pt_pos[np.maximum(cf.map_pt, 0)] @ Tc_cand[:3, :3].T
                + Tc_cand[:3, 3]
            )
            P2_all = (
                self.map.pt_pos[np.maximum(cur.map_pt, 0)] @ Tc_cur[:3, :3].T
                + Tc_cur[:3, 3]
            )
            ext_assign, n_ext = bow_match.search_by_sim3(
                jnp.asarray(P1_all.astype(np.float32)), cf.kp.desc,
                jnp.asarray(cf.xy), jnp.asarray(cf.octave),
                jnp.asarray(cand_free),
                jnp.asarray(P2_all.astype(np.float32)), cur.kp.desc,
                jnp.asarray(cur.xy), jnp.asarray(cur.octave),
                jnp.asarray(cur_free),
                jnp.asarray(sR.astype(np.float32)),
                jnp.asarray(np.asarray(res.t).astype(np.float32)),
                cam.fx, cam.fy, cam.cx, cam.cy,
                jnp.asarray(self.map.scale_factors),
                jnp.float32(np.log(self.map.scale_factors[1]
                                   / self.map.scale_factors[0])),
                jnp.asarray(
                    self.map.pt_max_dist[np.maximum(cf.map_pt, 0)].astype(
                        np.float32)
                ),
                jnp.asarray(
                    self.map.pt_max_dist[np.maximum(cur.map_pt, 0)].astype(
                        np.float32)
                ),
            )
            if int(n_ext) + int(res.n_inliers) < 40:
                continue
            # union match set: BoW pairs + the Sim3 window extension
            # (LoopClosing.cc:345-360: SearchBySim3 fills empty slots of
            # vpMapPointMatches in place, so OptimizeSim3 runs over the
            # COMBINED set) — dedup by candidate feature
            ext = np.asarray(ext_assign)
            in_bow = np.zeros(N, bool)
            in_bow[ai] = True
            ext_ai = np.nonzero((ext >= 0) & ~in_bow)[0]
            af = np.concatenate([ai, ext_ai])
            bf = np.concatenate([bi, ext[ext_ai]])
            mu = len(af)
            P1u = P1_all[af].astype(np.float32)
            P2u = P2_all[bf].astype(np.float32)
            uv1u = cf.xy[af]
            uv2u = cur.xy[bf]
            inv1u = np.ones(N, np.float32)
            inv1u[:mu] = 1.0 / sf2[cf.octave[af]]
            inv2u = np.ones(N, np.float32)
            inv2u[:mu] = 1.0 / sf2[cur.octave[bf]]
            validu = np.zeros(N, bool)
            validu[:mu] = True

            def _padu(a, tail=()):
                out = np.zeros((N,) + tail, np.float32)
                out[:mu] = a
                return out

            # refine S: cand -> cur over the union set (the reference
            # optimizes S12 over the combined matches, Optimizer.cc:2018)
            opt = sim3_opt.optimize_sim3(
                res.R, res.t, res.s,
                jnp.asarray(_padu(P2u, (3,))), jnp.asarray(_padu(P1u, (3,))),
                jnp.asarray(_padu(uv2u, (2,))), jnp.asarray(_padu(uv1u, (2,))),
                jnp.asarray(inv2u), jnp.asarray(inv1u),
                jnp.asarray(validu),
                cam.fx, cam.fy, cam.cx, cam.cy,
                fix_scale=fix_scale,
            )
            # acceptance: the reference requires >= 20 post-refine inliers
            # (LoopClosing.cc:285-306) and >= 40 total matches around the
            # refined Sim3; we gate on >= 40 POST-REFINE inliers — the
            # stricter combination, after r4's accepted-but-harmful
            # correction showed the looser gates let weak Sim3s through
            opt_inl = np.asarray(opt.inliers)[:mu]
            if int(opt_inl.sum()) < 40:
                continue
            # corrected current pose: S_cur_w = S_cand->cur o T_cand_w
            S_rel = np.eye(4, dtype=np.float32)
            S_rel[:3, :3] = np.asarray(opt.R) * float(opt.s)
            S_rel[:3, 3] = np.asarray(opt.t)
            # the verified loop matches (mvpCurrentMatchedPoints),
            # restricted to the refine's surviving inliers
            matched: Dict[int, int] = {}
            for k_i in np.nonzero(opt_inl)[0]:
                pid = int(cf.map_pt[af[k_i]])
                cur_feat = int(bf[k_i])
                if (cur_feat not in matched and pid >= 0
                        and self.map.pt_alive[pid]):
                    matched[cur_feat] = pid
            return cand, (S_rel, float(opt.s)), matched
        return None

    # ------------------------------------------------------------- correct

    def _propagate_correction(self, kf_id: int, loop_kf: int, S_corr,
                              fix_scale: bool = True):
        """Correct the current KF's covisible neighborhood + their points
        (LoopClosing.cc:438-521). Returns (corrected ids, pre-correction
        poses, corrected Sim3 per KF, point->corrector-KF map)."""
        S_rel, scale = S_corr
        m = self.map
        T_cur_old = m.kf_pose[kf_id].astype(np.float64)
        T_cand = m.kf_pose[loop_kf]
        # corrected current pose as a Sim3 4x4 [sR|t] (mg2oScw =
        # g2oSrel * Scand_w, LoopClosing.cc:310-318); for mono
        # (fix_scale=False) the loop scale rides through the whole
        # neighborhood correction and into the essential graph
        S_cur_new = np.vstack([S_rel[:3], [0, 0, 0, 1]]).astype(
            np.float64) @ T_cand
        if fix_scale:
            # stereo/RGBD: the reference pins the solver scale at 1; if a
            # residual scale leaked through, collapse to SE3 as [R | t/s]
            S_cur_new[:3, :] /= scale if scale != 0 else 1.0
        inv_T_cur_old = np.linalg.inv(T_cur_old)
        corrected = {kf_id} | {
            k for k, _ in m.covisible_keyframes(kf_id)
        }
        # pre-correction poses: the essential graph's normal-edge
        # measurements must come from these (the reference's
        # NonCorrectedSim3, LoopClosing.cc:438-447 / Optimizer.cc:1869-1886
        # — measuring them from the corrected poses would make every
        # residual zero and the graph a no-op)
        uncorrected = {k: m.kf_pose[k].copy() for k in corrected}
        # corrected Sim3 per neighborhood KF (the reference's CorrectedSim3
        # map): g2oCorrectedSiw = g2oSic * mg2oScw (LoopClosing.cc:460-464)
        # — RIGHT-composed so each covisible keeps its pose relative to
        # the current KF; left-composing a world-frame delta would distort
        # any neighbor whose orientation differs from the current KF's
        corrected_sim3: Dict[int, tuple] = {}
        # which points each corrected KF moves (the reference's
        # mnCorrectedByKF/mnCorrectedReference bookkeeping, used by the
        # essential graph's point correction)
        corrected_ref: Dict[int, int] = {}
        seen = np.zeros(m.n_points, bool)
        for k in corrected:
            T_old = uncorrected[k].astype(np.float64)
            S_new = T_old @ inv_T_cur_old @ S_cur_new
            s_k = float(np.cbrt(np.linalg.det(S_new[:3, :3])))
            R_k = S_new[:3, :3] / s_k
            t_k = S_new[:3, 3]
            corrected_sim3[k] = (R_k.astype(np.float32),
                                 t_k.astype(np.float32), s_k)
            # stored SE3 pose is [R | t/s] (LoopClosing.cc:488-496)
            T_new = np.eye(4, dtype=np.float32)
            T_new[:3, :3] = R_k
            T_new[:3, 3] = t_k / s_k
            m.set_kf_pose(k, T_new)
            # move the KF's points through the scaled Sim3:
            # p_new = Swi_corr.map(Siw_old.map(p)) (LoopClosing.cc:499-505)
            # — vectorized over the keyframe's unclaimed live points (the
            # r4 per-point python loop was a visible slice of CorrectLoop)
            frame = m.kf_frames[k]
            pids = frame.map_pt[frame.map_pt >= 0]
            pids = np.unique(pids[m.pt_alive[pids] & ~seen[pids]])
            if len(pids) == 0:
                continue
            seen[pids] = True
            for pid in pids:
                corrected_ref[int(pid)] = k
            p = m.pt_pos[pids].astype(np.float64)
            pc = p @ T_old[:3, :3].T + T_old[:3, 3]
            m.pt_pos[pids] = (((pc - t_k) @ R_k) / s_k).astype(np.float32)
        return corrected, uncorrected, corrected_sim3, corrected_ref

    def _correct_loop(self, kf_id: int, loop_kf: int, S_corr,
                      matched: Optional[Dict[int, int]] = None,
                      fix_scale: bool = True):
        """Propagate the loop correction, fuse the loop sides, and run the
        essential graph + global BA."""
        # join any previous deferred GBA before correcting on top of it
        self.collect_gba()
        m = self.map
        # a loop correction rewrites poses + points wholesale: the device
        # mirror's delta tracking can't follow it — force a full resync
        m.mark_all_dirty()
        corrected, uncorrected, corrected_sim3, corrected_ref = (
            self._propagate_correction(kf_id, loop_kf, S_corr, fix_scale)
        )

        # snapshot covisibility before any fusion: new connections created
        # by fusing loop-side points are the loop edges of the essential
        # graph (LoopClosing.cc:553-571 — vpPreviousNeighbors is the cache
        # refreshed during pose correction, before the loop fusion)
        prev_nb = {
            k: {nb for nb, _ in m.covisible_keyframes(k)} for k in corrected
        }

        # "Start Loop Fusion" (LoopClosing.cc:523-541): the Sim3-verified
        # matches replace the current keyframe's duplicates directly — the
        # loop point wins
        cur_frame = m.kf_frames[kf_id]
        for cur_feat, loop_pid in (matched or {}).items():
            if not m.pt_alive[loop_pid]:
                continue
            existing = int(cur_frame.map_pt[cur_feat])
            if existing >= 0 and m.pt_alive[existing]:
                if existing != loop_pid:
                    self._replace_point(loop_pid, existing)
                    m.compute_distinctive_descriptor(loop_pid)
                    m.update_normal_and_depth(loop_pid)
            elif kf_id not in m.pt_obs[loop_pid]:
                m.add_observation(loop_pid, kf_id, cur_feat)
                cur_frame.map_pt[cur_feat] = loop_pid
                m.compute_distinctive_descriptor(loop_pid)
        # fuse the loop side's map points into the corrected neighborhood
        # (LoopClosing::SearchAndFuse, LoopClosing.cc:547-582)
        self._search_and_fuse(sorted(corrected), loop_kf)
        loop_connections: Dict[int, Dict[int, int]] = {}
        for k in corrected:
            new_nb = {
                nb: w for nb, w in m.covisible_keyframes(k)
                if nb not in prev_nb[k] and nb not in corrected
            }
            if new_nb:
                loop_connections[k] = new_nb

        # essential graph over all alive keyframes
        self._run_essential_graph(
            kf_id, loop_kf, uncorrected, loop_connections, corrected_ref,
            corrected_sim3=corrected_sim3, fix_scale=fix_scale,
        )
        # full map refinement. The reference spawns RunGlobalBundleAdjustment
        # on a thread (LoopClosing.cc:584) and merges the result back into a
        # map that kept growing; here the GBA device program is DISPATCHED
        # asynchronously (XLA dispatch returns futures — tracking continues
        # while the chip crunches) and merged at the next keyframe event
        # (collect_gba), including spanning-tree correction of keyframes
        # created in the interim. 40 LM iterations, not the reference's 10:
        # after SearchAndFuse merges the two loop populations their residual
        # offset is the whole loop drift, and an under-converged GBA leaves
        # the merged landmark field internally inconsistent.
        from ..solvers.local_ba import (
            apply_global_ba, global_bundle_adjustment_async,
        )

        self.pending_gba = global_bundle_adjustment_async(
            self.cfg, self.map, n_iters=40
        )
        if not self.async_gba and self.pending_gba is not None:
            apply_global_ba(self.pending_gba, self.map)
            self.pending_gba = None

    def collect_gba(self, only_if_ready: bool = False) -> bool:
        """Merge a pending deferred global BA into the (possibly grown)
        map — the reference's RunGlobalBundleAdjustment merge-back.
        Returns True if a merge happened. only_if_ready: non-blocking
        probe (skip unless the device result already landed)."""
        h = self.pending_gba
        if h is None:
            return False
        if only_if_ready:
            try:
                if not h.res.kf_pose.is_ready():
                    return False
            except AttributeError:
                pass
        from ..solvers.local_ba import apply_global_ba

        self.pending_gba = None
        apply_global_ba(h, self.map)
        return True

    def _replace_point(self, keep: int, kill: int):
        """MapPoint::Replace (the loop point `keep` wins): absorb `kill`'s
        observations, rewire every observing frame's feature slot, and
        retire `kill`."""
        m = self.map
        for okf, ofeat in list(m.pt_obs[kill].items()):
            of = m.kf_frames[okf]
            if okf not in m.pt_obs[keep]:
                m.add_observation(keep, okf, ofeat)
                of.map_pt[ofeat] = keep
            else:
                of.map_pt[ofeat] = -1
        m.retire_point(kill)
        m.pt_found[keep] += m.pt_found[kill]
        m.pt_visible[keep] += m.pt_visible[kill]

    def _search_and_fuse(self, corrected_kfs, loop_kf: int):
        """LoopClosing::SearchAndFuse (547-582): project the loop side's
        map points (loop KF + its covisibles) into every corrected
        keyframe with the already-corrected poses; radius 4 (ORBmatcher::
        Fuse(Scw, ...) th=4). On conflict the LOOP point wins — the
        reference calls pRep->Replace(pLoopMP) unconditionally.

        Device shape: all (corrected KF x loop point) projections +
        window searches + Hamming as ONE dispatch (the same
        fuse_into_keyframes program local mapping uses, with scw=True:
        the Scw variant of ORBmatcher.cc:983-1106 — no per-candidate
        reprojection gate, level window [pred-1, pred]); host applies
        the Replace bookkeeping."""
        from ..ops import match as match_ops
        from ..utils import argpack

        m = self.map
        cam = self.cfg.camera

        loop_side = [loop_kf] + [k for k, _ in m.covisible_keyframes(loop_kf)]
        chunks_pts = [m.kf_frames[k].map_pt for k in loop_side
                      if m.kf_alive[k]]
        if chunks_pts:
            allp = np.concatenate(chunks_pts)
            allp = allp[allp >= 0]
            loop_pts = np.unique(allp[m.pt_alive[allp]])
        else:
            loop_pts = np.zeros(0, np.int64)
        targets = [k for k in corrected_kfs if m.kf_alive[k]]
        if len(loop_pts) == 0 or not targets:
            return
        pid_arr = np.asarray(loop_pts, np.int64)
        # FIXED-shape chunked dispatches: (16-target x 4096-point) tiles
        # of the (targets x loop points) fuse with the compact (F_CAP, 3)
        # download — one compiled program for every loop event of the
        # session (the r4 pow2-grown (nb_cap, p_cap) dense call compiled
        # a fresh shape + downloaded a dense assignment per event)
        T_CH, P_CH = 16, 4096
        sf = m.scale_factors
        f32 = np.float32
        tail = (
            np.asarray(sf, f32),
            np.asarray(np.log(sf[1] / sf[0]) if len(sf) > 1 else 1.0, f32),
            np.asarray(cam.fx, f32), np.asarray(cam.fy, f32),
            np.asarray(cam.cx, f32), np.asarray(cam.cy, f32),
            np.asarray(cam.width, f32), np.asarray(cam.height, f32),
            np.asarray(cam.bf, f32),
            np.asarray(4.0, f32),
        )
        t_chunks = [targets[i:i + T_CH] for i in range(0, len(targets),
                                                       T_CH)]
        kf_stacks = []
        for tch in t_chunks:
            frames = [m.kf_frames[k] for k in tch]
            f0 = frames[0]
            pad = T_CH - len(frames)

            def ur_of(f):
                return (f.ur_dev if getattr(f, "ur_dev", None) is not None
                        else jnp.asarray(np.asarray(f.u_right, f32)))

            kf_stacks.append((
                jnp.stack([f.kp.xy for f in frames] + [f0.kp.xy] * pad),
                jnp.stack([f.kp.octave for f in frames]
                          + [f0.kp.octave] * pad),
                jnp.stack([f.kp.desc for f in frames] + [f0.kp.desc] * pad),
                jnp.stack([f.kp.valid for f in frames]
                          + [f0.kp.valid] * pad),
                jnp.stack([ur_of(f) for f in frames] + [ur_of(f0)] * pad),
                np.stack([m.kf_pose[k] for k in tch]
                         + [m.kf_pose[tch[0]]] * pad).astype(f32),
            ))
        flats = []
        for p0 in range(0, len(pid_arr), P_CH):
            pch = pid_arr[p0:p0 + P_CH]
            npch = len(pch)
            pos = np.zeros((P_CH, 3), f32)
            desc = np.zeros((P_CH, 32), np.uint8)
            normal = np.zeros((P_CH, 3), f32)
            mind = np.ones(P_CH, f32)
            maxd = np.ones(P_CH, f32)
            pos[:npch] = m.pt_pos[pch]
            desc[:npch] = m.pt_desc[pch]
            normal[:npch] = m.pt_normal[pch]
            mind[:npch] = m.pt_min_dist[pch]
            maxd[:npch] = m.pt_max_dist[pch]
            for ti, tch in enumerate(t_chunks):
                mask = np.zeros((T_CH, P_CH), bool)
                mask[: len(tch), :npch] = True
                flat = argpack.call_packed(
                    match_ops.fuse_into_keyframes_compact,
                    *kf_stacks[ti],
                    pos, desc, normal, mind, maxd, mask,
                    *tail, scw=True,
                )
                flats.append((tch, pch, flat))

        touched = set()
        n_replaced = n_added = 0
        merge_dists = []
        for tch, pch, flat in flats:
            flat = np.asarray(flat)
            triples = flat[:-1].reshape(match_ops.F_CAP, 3)
            count = int(flat[-1])
            triples = triples[: min(count, match_ops.F_CAP)].astype(np.int64)
            triples = triples[triples[:, 0] < len(tch)]
            for t, i, feat in triples:
                nb = tch[int(t)]
                frame = m.kf_frames[nb]
                pid = int(pch[i])
                if not m.pt_alive[pid] or nb in m.pt_obs[pid]:
                    continue
                feat = int(feat)
                existing = int(frame.map_pt[feat])
                if existing >= 0 and m.pt_alive[existing]:
                    if existing == pid:
                        continue
                    n_replaced += 1
                    merge_dists.append(float(np.linalg.norm(
                        m.pt_pos[pid] - m.pt_pos[existing])))
                    self._replace_point(pid, existing)
                    touched.add(pid)
                else:
                    m.add_observation(pid, nb, feat)
                    frame.map_pt[feat] = pid
                    touched.add(pid)
                    n_added += 1
        alive_touched = [p for p in touched if m.pt_alive[p]]
        m.compute_distinctive_descriptor_batch(alive_touched)
        m.update_normal_and_depth_batch(alive_touched)
        self.last_fuse_stats = {
            "targets": len(targets), "loop_pts": len(loop_pts),
            "replaced": n_replaced, "added": n_added,
            "merge_dist_med": float(np.median(merge_dists))
            if merge_dists else 0.0,
            "merge_dist_p90": float(np.percentile(merge_dists, 90))
            if merge_dists else 0.0,
        }

    def _run_essential_graph(
        self,
        kf_id: int,
        loop_kf: int,
        uncorrected: Optional[Dict[int, "np.ndarray"]] = None,
        loop_connections: Optional[Dict[int, Dict[int, int]]] = None,
        corrected_ref: Optional[Dict[int, int]] = None,
        corrected_sim3: Optional[Dict[int, tuple]] = None,
        fix_scale: bool = True,
    ):
        """Optimizer::OptimizeEssentialGraph (Optimizer.cc:1753-2016).

        Vertex init = current poses, with the corrected neighborhood's
        vertices seeded from the full CorrectedSim3 (scale included — the
        reference's vScw, Optimizer.cc:1814-1831); the loop keyframe is
        the fixed gauge. Edge measurements follow the reference exactly:

        * loop edges — the new covisibility connections created by the
          fuse (weight >= 100; the cur<->loop pair always) — are measured
          from the CORRECTED Sim3s: they encode the loop constraint
          (including its scale, which the graph distributes around the
          cycle for mono);
        * normal edges (sequential spanning-tree surrogate, covisibility
          >= 100, past loop closures) are measured from the PRE-correction
          poses (`uncorrected`, the reference's NonCorrectedSim3): they
          encode the odometry, so optimizing distributes the loop
          discontinuity around the whole cycle.

        Afterwards every map point is moved by its reference keyframe's
        Sim3 delta (points already moved by CorrectLoop use the keyframe
        that corrected them, per mnCorrectedReference).
        """
        m = self.map
        uncorrected = uncorrected or {}
        loop_connections = loop_connections or {}
        corrected_ref = corrected_ref or {}
        corrected_sim3 = corrected_sim3 or {}
        alive = [k for k in range(m.n_keyframes) if m.kf_alive[k]]
        slot = {k: i for i, k in enumerate(alive)}
        K = len(alive)

        def scw(k, corrected_meas):
            """vScw semantics as a 4x4 [sR|t]: corrected Sim3 for the
            neighborhood when measuring corrected edges; NonCorrectedSim3
            (pre-correction SE3) otherwise; plain current pose for
            keyframes outside the neighborhood."""
            if corrected_meas and k in corrected_sim3:
                R, t, s = corrected_sim3[k]
                M = np.eye(4)
                M[:3, :3] = s * np.asarray(R, np.float64)
                M[:3, 3] = t
                return M
            if not corrected_meas:
                return uncorrected.get(k, m.kf_pose[k]).astype(np.float64)
            return m.kf_pose[k].astype(np.float64)

        inserted = set()
        e_i, e_j, e_R, e_t, e_s = [], [], [], [], []

        def add_edge(a, b, corrected_meas):
            key = (min(a, b), max(a, b))
            if key in inserted or a not in slot or b not in slot:
                return
            inserted.add(key)
            # Sji = Sjw o Siw^-1; 4x4 [sR|t] matrices compose/invert as
            # Sim3s under plain matmul/inverse
            Sji = scw(b, corrected_meas) @ np.linalg.inv(
                scw(a, corrected_meas))
            s_ji = float(np.cbrt(np.linalg.det(Sji[:3, :3])))
            e_i.append(slot[a])
            e_j.append(slot[b])
            e_R.append(Sji[:3, :3] / s_ji)
            e_t.append(Sji[:3, 3])
            e_s.append(s_ji)

        # loop edges first (corrected measurements)
        add_edge(kf_id, loop_kf, True)
        for a, nbs in loop_connections.items():
            for b, w in nbs.items():
                if w >= 100:
                    add_edge(a, b, True)
        # normal edges (pre-correction measurements)
        for a, b in self.loop_edges:
            add_edge(a, b, False)
        for k in alive:
            if k - 1 in slot:
                add_edge(k - 1, k, False)
            for nb, w in m.covisible_keyframes(k):
                if w >= 100:
                    add_edge(k, nb, False)

        # vertex init: full corrected Sim3 for the neighborhood, SE3
        # elsewhere (Optimizer.cc:1814-1831)
        R0 = m.kf_pose[alive][:, :3, :3].astype(np.float32).copy()
        t0 = m.kf_pose[alive][:, :3, 3].astype(np.float32).copy()
        s0 = np.ones(K, np.float32)
        for k, (Rk, tk, sk) in corrected_sim3.items():
            if k in slot:
                i = slot[k]
                R0[i], t0[i], s0[i] = Rk, tk, sk

        # FIXED padded shapes: pow2 vertex/edge buckets so the session
        # compiles at most a couple of essential-graph programs instead
        # of one per loop event (r4: data-dependent (K, E) shapes put a
        # fresh remote compile inside every CorrectLoop). Padding
        # vertices are fixed identity Sim3s with no edges; padding edges
        # carry e_valid=False (zero weight in H/g and in the cost).
        E = len(e_i)
        K_cap = 64
        while K_cap < K:
            K_cap *= 2
        E_cap = 512
        while E_cap < max(E, 1):
            E_cap *= 2
        R_pad = np.tile(np.eye(3, dtype=np.float32), (K_cap, 1, 1))
        t_pad = np.zeros((K_cap, 3), np.float32)
        s_pad = np.ones(K_cap, np.float32)
        R_pad[:K], t_pad[:K], s_pad[:K] = R0, t0, s0
        fixed_pad = np.ones(K_cap, bool)
        fixed_pad[:K] = np.array([k == loop_kf for k in alive])
        ei_pad = np.zeros(E_cap, np.int32)
        ej_pad = np.zeros(E_cap, np.int32)
        eR_pad = np.tile(np.eye(3, dtype=np.float32), (E_cap, 1, 1))
        et_pad = np.zeros((E_cap, 3), np.float32)
        es_pad = np.ones(E_cap, np.float32)
        ev_pad = np.zeros(E_cap, bool)
        if E:
            ei_pad[:E] = np.array(e_i, np.int32)
            ej_pad[:E] = np.array(e_j, np.int32)
            eR_pad[:E] = np.stack(e_R).astype(np.float32)
            et_pad[:E] = np.stack(e_t).astype(np.float32)
            es_pad[:E] = np.array(e_s, np.float32)
            ev_pad[:E] = True
        prob = eg.EGProblem(
            R=jnp.asarray(R_pad), t=jnp.asarray(t_pad),
            s=jnp.asarray(s_pad), fixed=jnp.asarray(fixed_pad),
            e_i=jnp.asarray(ei_pad), e_j=jnp.asarray(ej_pad),
            e_R=jnp.asarray(eR_pad), e_t=jnp.asarray(et_pad),
            e_s=jnp.asarray(es_pad), e_valid=jnp.asarray(ev_pad),
        )
        R_opt, t_opt, s_opt = eg.optimize_essential_graph(
            prob, fix_scale=fix_scale)
        R_opt = np.asarray(R_opt, np.float64)[:K]
        t_opt = np.asarray(t_opt, np.float64)[:K]
        s_opt = np.asarray(s_opt, np.float64)[:K]
        self.loop_edges.add((min(kf_id, loop_kf), max(kf_id, loop_kf)))

        # per-KF Sim3 delta (vertex init -> optimized), then move each
        # point by its reference keyframe's delta: p_new =
        # correctedSwr.map(Srw.map(p)) (Optimizer.cc:1964-2014) — all
        # batched (the r4 per-point python loop + per-point normal/depth
        # update was the bulk of CorrectLoop's 24 s)
        M_init = np.tile(np.eye(4), (K, 1, 1))
        M_init[:, :3, :3] = s0[:, None, None] * R0.astype(np.float64)
        M_init[:, :3, 3] = t0
        M_new = np.tile(np.eye(4), (K, 1, 1))
        M_new[:, :3, :3] = s_opt[:, None, None] * R_opt
        M_new[:, :3, 3] = t_opt
        deltas_arr = np.linalg.inv(M_new) @ M_init       # (K, 4, 4)
        for i, k in enumerate(alive):
            # stored SE3 pose = [R | t/s] (Optimizer.cc:1950-1961)
            T_new = np.eye(4, dtype=np.float32)
            T_new[:3, :3] = R_opt[i]
            T_new[:3, 3] = t_opt[i] / max(s_opt[i], 1e-9)
            m.set_kf_pose(k, T_new)
        n_pts = m.n_points
        ref = m.pt_ref_kf[:n_pts].copy()
        for pid, k in corrected_ref.items():
            if pid < n_pts:
                ref[pid] = k
        slot_arr = np.full(m.n_keyframes, -1, np.int64)
        for i, k in enumerate(alive):
            slot_arr[k] = i
        ok_ref = (ref >= 0) & (ref < m.n_keyframes)
        ref_slot = np.where(ok_ref, slot_arr[np.maximum(ref, 0)], -1)
        sel = m.pt_alive[:n_pts] & (ref_slot >= 0)
        pids = np.nonzero(sel)[0]
        if len(pids):
            D = deltas_arr[ref_slot[pids]]
            p = m.pt_pos[pids].astype(np.float64)
            m.pt_pos[pids] = (
                np.einsum("nij,nj->ni", D[:, :3, :3], p) + D[:, :3, 3]
            ).astype(np.float32)
            m.update_normal_and_depth_batch(pids)

"""Bundle-adjustment window assembly (Optimizer.cc:505-871 local BA;
Optimizer.cc:51-249 global BA).

Host side: gathers a keyframe/point window, packs padded edge arrays
(bucketed sizes to bound XLA compilations), runs the Schur LM core
(ba_core.py), and writes results back into the map store — including
erasing observations that end as outliers, exactly as the reference's
joint erase pass (Optimizer.cc:820-850).
"""

from __future__ import annotations

import numpy as np

from ..geometry import camera
from ..utils import argpack
from .ba_core import BAProblem, ba_solve


def _bucket(n: int, quantum: int = 2048) -> int:
    """Pad to a coarse fixed grid: on TPU the padded FLOPs are negligible
    while every new shape costs a full XLA compile (tens of seconds through
    a remote-compile link)."""
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


def _bucket_kf(n: int) -> int:
    return max(32, ((n + 31) // 32) * 32)


# Local BA runs at every keyframe event, so its solver must hit a COMPILED
# shape essentially always: the window sizes are tied to one of three rungs
# (small / medium / full), giving at most 3 ba_solve variants per session —
# all prewarmable at startup (slam/prewarm.py). Windows beyond the last
# rung are trimmed (weakest-covisibility keyframes, least-observed points,
# strided edge subsample) — a deliberate deviation from the reference,
# which lets local BA grow without bound (Optimizer.cc:505-544).
LBA_RUNGS = (
    # (n_kf, n_pt, n_e)
    (32, 2048, 4096),
    (64, 8192, 16384),
    (64, 16384, 32768),
)

# Global BA (loop closure's deferred GBA) rungs: the whole-map problem
# grows with the session, and the r4 open-ended 2048-quantum bucket grid
# meant nearly every loop event compiled a fresh GBA shape inside
# CorrectLoop (jit compiles block at dispatch). A coarse rung ladder
# gives at most 4 shapes per session, prewarmable when loop closing is
# enabled; maps beyond the last rung fall back to the open grid (rare —
# one compile, flagged by the lc stage timer).
GBA_RUNGS = (
    (64, 8192, 16384),
    (64, 16384, 32768),
    (128, 32768, 65536),
    (256, 65536, 131072),
)


def _pick_rung(table, n_kf: int, n_pt: int, n_e: int):
    """Smallest rung that fits (n_kf, n_pt, n_e); None if none fits."""
    for rung in table:
        if n_kf <= rung[0] and n_pt <= rung[1] and n_e <= rung[2]:
            return rung
    return None


def _lba_rung(n_kf: int, n_pt: int, n_e: int):
    """Smallest rung that fits (n_kf, n_pt, n_e); the last rung if none."""
    r = _pick_rung(LBA_RUNGS, n_kf, n_pt, n_e)
    return r if r is not None else LBA_RUNGS[-1]


def _assemble(cfg, m, local_kfs, fixed_kfs, pts, extra_fixed=frozenset(),
              tied_rungs=False, rung_table=None):
    """Pack a keyframe/point window into a padded BAProblem. Returns
    (prob, K, all_kfs, e_feat, E) or None when the window is degenerate.

    tied_rungs: pick the padded sizes from LBA_RUNGS (local BA: bounded
    compile count) instead of the open-ended _bucket grid. rung_table:
    an explicit rung ladder (GBA_RUNGS for the deferred global BA); a
    window too big for the last rung falls back to the open grid."""
    all_kfs = list(local_kfs) + list(fixed_kfs)
    kf_slot = {k: i for i, k in enumerate(all_kfs)}
    if len(pts) == 0 or len(all_kfs) < 2:
        return None

    # Edge assembly, vectorized per keyframe: each window frame's map_pt
    # array IS its observation list (kept in lockstep with pt_obs by the
    # map store), so the per-point dict loops collapse into numpy gathers.
    pt_lookup = np.full(m.n_points, -1, np.int32)
    pt_lookup[np.asarray(pts)] = np.arange(len(pts), dtype=np.int32)
    inv_sigma2 = 1.0 / (m.scale_factors ** 2)
    cols_kf, cols_pt, cols_obs, cols_inv, cols_qual = [], [], [], [], []
    e_feat = []
    for k in all_kfs:
        frame = m.kf_frames[k]
        feats = np.nonzero(frame.map_pt >= 0)[0]
        pids = frame.map_pt[feats]
        sl = pt_lookup[pids]
        keep = sl >= 0
        # exact-semantics gate: only edges the observation dicts confirm
        # (cheap single dict get per candidate edge)
        if keep.any():
            idx = np.nonzero(keep)[0]
            confirm = np.fromiter(
                (m.pt_obs[int(pids[i])].get(k) == int(feats[i])
                 for i in idx),
                bool, len(idx),
            )
            keep[idx] = confirm
        feats, pids, sl = feats[keep], pids[keep], sl[keep]
        if len(feats) == 0:
            continue
        cols_kf.append(np.full(len(feats), kf_slot[k], np.int32))
        cols_pt.append(sl.astype(np.int32))
        cols_obs.append(np.stack(
            [frame.xy[feats, 0], frame.xy[feats, 1],
             frame.u_right[feats]], axis=1,
        ).astype(np.float32))
        cols_inv.append(inv_sigma2[frame.octave[feats]].astype(np.float32))
        if cfg.iv.propagate_keyptqual:
            cols_qual.append(m.pt_quality[pids].astype(np.float32))
        else:
            cols_qual.append(frame.qual_score[feats].astype(np.float32))
        e_feat.extend(
            (int(p), k, int(f)) for p, f in zip(pids, feats)
        )
    if not cols_kf:
        return
    e_kf = np.concatenate(cols_kf)
    e_pt = np.concatenate(cols_pt)
    e_obs = np.concatenate(cols_obs)
    e_inv = np.concatenate(cols_inv)
    e_qual = np.concatenate(cols_qual)
    if len(e_kf) < 10:
        return

    rung = None
    if tied_rungs:
        rung = _lba_rung(len(all_kfs), len(pts), len(e_kf))
    elif rung_table is not None:
        rung = _pick_rung(rung_table, len(all_kfs), len(pts), len(e_kf))
    if rung is not None:
        n_kf, n_pt, n_e = rung
        if len(e_kf) > n_e:
            # strided subsample keeps per-keyframe proportions roughly
            # intact (edges are concatenated per keyframe in order)
            keep = np.linspace(0, len(e_kf) - 1, n_e).astype(np.int64)
            e_kf, e_pt, e_obs = e_kf[keep], e_pt[keep], e_obs[keep]
            e_inv, e_qual = e_inv[keep], e_qual[keep]
            e_feat = [e_feat[i] for i in keep]
    else:
        n_kf = _bucket_kf(len(all_kfs))
        n_pt = _bucket(len(pts))
        n_e = _bucket(len(e_kf))

    kf_pose = np.zeros((n_kf, 4, 4), np.float32)
    kf_pose[:, range(4), range(4)] = 1.0
    kf_pose[: len(all_kfs)] = m.kf_pose[all_kfs]
    kf_fixed = np.ones(n_kf, bool)
    for i, k in enumerate(all_kfs):
        # the origin keyframe stays fixed even when local (Optimizer.cc:545)
        kf_fixed[i] = (
            (i >= len(local_kfs)) or (k == m.origin_kf) or (k in extra_fixed)
        )

    pt_pos = np.zeros((n_pt, 3), np.float32)
    pt_pos[: len(pts)] = m.pt_pos[pts]
    pt_valid = np.zeros(n_pt, bool)
    pt_valid[: len(pts)] = True

    E = len(e_kf)
    # all fields stay HOST numpy: the ba_solve call sites ship the whole
    # problem as ONE packed upload (utils/argpack.py) instead of 10 RPCs
    prob = BAProblem(
        kf_pose=kf_pose,
        kf_fixed=kf_fixed,
        pt_pos=pt_pos,
        pt_valid=pt_valid,
        e_kf=np.pad(np.array(e_kf, np.int32), (0, n_e - E)),
        e_pt=np.pad(np.array(e_pt, np.int32), (0, n_e - E)),
        e_obs=np.pad(
            np.array(e_obs, np.float32),
            ((0, n_e - E), (0, 0)),
            constant_values=-1.0,
        ),
        e_inv_s2=np.pad(np.array(e_inv, np.float32), (0, n_e - E)),
        e_qual=np.pad(np.array(e_qual, np.float32), (0, n_e - E),
                      constant_values=1.0),
        e_valid=np.pad(np.ones(E, bool), (0, n_e - E),
                       constant_values=False),
    )
    cam = cfg.camera
    K = camera.Intrinsics(*(np.asarray(v, np.float32) for v in
                            (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)))
    return prob, K, all_kfs, e_feat, E


def _ba_solve_packed(prob, K, n_iters1=5, n_iters2=10, kernel2=False,
                     midpoint_gate=True):
    """ba_solve with the whole (host-numpy) BAProblem + intrinsics shipped
    as one upload. All statics are always passed explicitly so equivalent
    calls share one wrapper cache entry (and prewarm hits it)."""
    return argpack.call_packed(
        ba_solve, prob, K, n_iters1=n_iters1, n_iters2=n_iters2,
        kernel2=kernel2, midpoint_gate=midpoint_gate,
    )


# Segment plan for the async (worker) local BA: phase 1 = 3 + 2 robust
# iterations, phase 2 = 4 + 3 + 3 kernel-off iterations — identical math
# to ba_solve(n_iters1=5, n_iters2=10, kernel2=False) but as five ~30 ms
# device programs with a host sync between them, so the worker never
# holds the chip for the full ~150 ms rung-2 solve while tracking's
# chained steps wait in the device queue.
BA_SEGMENTS = ((3, 2), (4, 3, 3))


def _ba_tree_identity(prob, K):
    """Traced pass-through: materializes a host BAProblem + intrinsics
    as DEVICE arrays via one packed upload + one dispatch (plain
    jax.device_put would pay one upload RPC per field — ~10 x 10-45 ms
    on the tunneled runtime)."""
    return prob, K


def _ba_solve_segmented_driver(prob, K, segs=BA_SEGMENTS, kernel2=False,
                               midpoint_gate=True):
    """Returns a drive() callable that uploads the problem (ONE packed
    upload), steps the LM segments — syncing the tiny lam scalar between
    dispatches to open device-queue gaps for the tracking thread — and
    returns the final BAResult. Everything, including the upload, is
    deferred to drive(): the caller (local_bundle_adjustment_async)
    assembles under the map lock, and the worker drives OFF the lock so
    tracking's host bookkeeping never waits on device round-trips."""
    import jax.numpy as jnp

    from .ba_core import ba_segment, ba_midpoint, ba_finalize

    def drive():
        prob_d, K_d = argpack.call_packed(_ba_tree_identity, prob, K)
        segs1, segs2 = segs
        zero, two = jnp.float32(0.0), jnp.float32(2.0)
        mask1 = prob_d.e_valid
        kf, pt = prob_d.kf_pose, prob_d.pt_pos
        lam, ni, chi = zero, two, zero
        first = True
        for n in segs1:
            kf, pt, lam, ni, chi = ba_segment(
                prob_d, K_d, kf, pt, lam, ni, chi, mask1,
                n_iters=n, kernel_on=True, init=first,
            )
            np.asarray(lam)  # fence: device-queue gap between segments
            first = False
        mask2 = ba_midpoint(prob_d, K_d, kf, pt) if midpoint_gate \
            else mask1
        first = True
        for n in segs2:
            kf, pt, lam, ni, chi = ba_segment(
                prob_d, K_d, kf, pt, lam, ni, chi, mask2,
                n_iters=n, kernel_on=kernel2, init=first,
            )
            np.asarray(lam)
            first = False
        return ba_finalize(prob_d, K_d, kf, pt)

    return drive


def _flat_ba_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def flat(kf_pose, pt_pos, e_inlier, e_chi2):
        return jnp.concatenate([
            kf_pose.reshape(-1), pt_pos.reshape(-1),
            e_inlier.astype(jnp.float32), e_chi2,
        ])

    return flat


_FLAT_BA = None


def _flatten_ba_result(res):
    """Pack the four host-bound result arrays into ONE device vector so
    the merge pays a single link round-trip (4 serial pulls measured
    ~25 ms each through the tunnel = most of the BA join time)."""
    global _FLAT_BA
    if _FLAT_BA is None:
        _FLAT_BA = _flat_ba_jit()
    return _FLAT_BA(res.kf_pose, res.pt_pos, res.e_inlier, res.e_chi2)


def _unflatten_ba_result(flat_np, n_kf, n_pt, n_e):
    o1 = n_kf * 16
    o2 = o1 + n_pt * 3
    o3 = o2 + n_e
    return (
        flat_np[:o1].reshape(n_kf, 4, 4),
        flat_np[o1:o2].reshape(n_pt, 3),
        flat_np[o2:o3] != 0.0,
        flat_np[o3:o3 + n_e],
    )


def _trim_window(m, local_kfs, fixed_kfs, pts):
    """Shrink an oversized local-BA window to the largest LBA rung:
    weakest-covisibility local keyframes, then most-redundant fixed
    keyframes, then least-observed points are dropped first. local_kfs
    is ordered [kf_id, covisibles by weight desc]; fixed_kfs in
    first-encountered order."""
    max_kf, max_pt, _ = LBA_RUNGS[-1]
    if len(local_kfs) > max_kf - 8:
        local_kfs = local_kfs[: max_kf - 8]  # keep slots for anchors
    if len(local_kfs) + len(fixed_kfs) > max_kf:
        budget = max_kf - len(local_kfs)
        # rank fixed keyframes by how many window points they anchor
        in_window = set(pts)
        scores = []
        for k in fixed_kfs:
            frame = m.kf_frames[k]
            pids = frame.map_pt[frame.map_pt >= 0]
            scores.append(sum(1 for p in pids if int(p) in in_window))
        order = np.argsort(scores)[::-1][:budget]
        fixed_kfs = [fixed_kfs[i] for i in sorted(order)]
    if len(pts) > max_pt:
        obs_counts = np.array([m.n_observations(p) for p in pts])
        keep = np.argsort(obs_counts)[::-1][:max_pt]
        kept = set(np.asarray(pts)[keep].tolist())
        pts = [p for p in pts if p in kept]
    return local_kfs, fixed_kfs, pts


def _run_ba(
    cfg, m, local_kfs, fixed_kfs, pts,
    n_iters1: int = 5, n_iters2: int = 10,
    erase_outliers: bool = True, extra_fixed=frozenset(),
    return_edges: bool = False,
    kernel2: bool = False, midpoint_gate: bool = True,
    tied_rungs: bool = False,
):
    if tied_rungs:
        local_kfs, fixed_kfs, pts = _trim_window(
            m, local_kfs, fixed_kfs, pts
        )
    packed = _assemble(cfg, m, local_kfs, fixed_kfs, pts,
                       extra_fixed=extra_fixed, tied_rungs=tied_rungs)
    if packed is None:
        return
    prob, K, all_kfs, e_feat, E = packed
    kf_fixed = np.asarray(prob.kf_fixed)
    n_local = len(local_kfs)
    res = _ba_solve_packed(prob, K, n_iters1=n_iters1, n_iters2=n_iters2,
                           kernel2=kernel2, midpoint_gate=midpoint_gate)

    # ONE link round-trip for everything host-bound (the tunneled runtime
    # pays a full RTT per materialized array)
    new_poses, new_pts, inlier_all, chi2_all = _unflatten_ba_result(
        np.asarray(_flatten_ba_result(res)),
        res.kf_pose.shape[0], res.pt_pos.shape[0], res.e_chi2.shape[0],
    )
    for i, k in enumerate(all_kfs[:n_local]):
        if not kf_fixed[i]:
            m.set_kf_pose(k, new_poses[i])
    m.pt_pos[pts] = new_pts[: len(pts)]
    m.mark_dirty(pts)

    if erase_outliers:
        inlier = inlier_all[:E]
        for idx in np.nonzero(~inlier)[0]:
            pid, k, feat = e_feat[idx]
            if m.pt_alive[pid] and m.pt_obs[pid].get(k) == feat:
                frame = m.kf_frames[k]
                frame.map_pt[feat] = -1
                m.erase_observation(pid, k)
    m.update_normal_and_depth_batch([p for p in pts if m.pt_alive[p]])
    if return_edges:
        return (
            pts, e_feat, chi2_all[:E], inlier_all[:E],
        )
    return None


def _local_window(m, kf_id: int):
    """(local_kfs, fixed_kfs, pts) for Optimizer::LocalBundleAdjustment."""
    local_kfs = [kf_id] + [k for k, _ in m.covisible_keyframes(kf_id)]
    local_kfs = [k for k in local_kfs if m.kf_alive[k]]
    local_set = set(local_kfs)

    pts = set()
    for k in local_kfs:
        frame = m.kf_frames[k]
        for pid in frame.map_pt[frame.map_pt >= 0]:
            if m.pt_alive[pid]:
                pts.add(int(pid))
    pts = sorted(pts)
    if not pts or len(local_kfs) < 2:
        return None

    fixed_kfs = []
    for pid in pts:
        for k in m.pt_obs[pid]:
            if k not in local_set and m.kf_alive[k] and k not in fixed_kfs:
                fixed_kfs.append(k)
    return local_kfs, fixed_kfs, pts


def local_bundle_adjustment(cfg, m, kf_id: int, return_edges: bool = False):
    """Covisibility-window BA (Optimizer::LocalBundleAdjustment)."""
    win = _local_window(m, kf_id)
    if win is None:
        return
    local_kfs, fixed_kfs, pts = win
    return _run_ba(cfg, m, local_kfs, fixed_kfs, pts,
                   return_edges=return_edges, tied_rungs=True)


class LBAHandle:
    """In-flight deferred local BA — the reference's threaded LocalMapping
    semantics (LocalMapping.cc:119-170 runs on its own thread; tracking
    never blocks on Optimizer::LocalBundleAdjustment). The solve is
    dispatched asynchronously here and merged when the device result is
    ready (is_ready probe) or at the next forced point (next keyframe
    event / loop closure / trajectory save).

    Segmented mode (driver != None): only the first LM segment is in
    flight at construction; drive() — called by the LocalMapping worker
    outside the map lock, or lazily by the merge — steps the remaining
    segments with a host sync between dispatches so the solve never
    holds the device queue for its full duration."""

    def __init__(self, res, all_kfs, kf_fixed, n_local, pts, e_feat, E,
                 driver=None):
        import threading

        self._driver = driver
        self._drive_lock = threading.Lock()
        if res is not None:
            self._set_res(res)
        else:
            self.res = None
            self.flat = None
        self.all_kfs = all_kfs
        self.kf_fixed = kf_fixed
        self.n_local = n_local
        self.pts = pts
        self.e_feat = e_feat
        self.E = E

    def _set_res(self, res):
        self.res = res
        # flattened on device: the merge pulls ONE array
        self.flat = _flatten_ba_result(res)
        self.shapes = (res.kf_pose.shape[0], res.pt_pos.shape[0],
                       res.e_chi2.shape[0])

    def drive(self):
        """Finish a segmented solve (idempotent, thread-safe: the worker
        and a forced join may race here)."""
        if self._driver is None:
            return
        with self._drive_lock:
            if self._driver is not None:
                self._set_res(self._driver())
                self._driver = None

    def is_ready(self) -> bool:
        if self._driver is not None:
            return False
        try:
            return self.flat.is_ready()
        except AttributeError:  # CPU backend arrays may lack is_ready
            return True


def local_bundle_adjustment_async(cfg, m, kf_id: int,
                                  segmented: bool = True):
    """Dispatch the covisibility-window BA WITHOUT blocking; returns an
    LBAHandle (or None when degenerate).

    segmented=True (worker mode): the solve runs as five smaller
    programs (_ba_solve_segmented_driver); the caller's worker thread
    must call handle.drive() off the map lock. apply_local_ba merges it.

    segmented=False (non-worker async mode, where _process_one runs ON
    the tracking thread): ONE non-blocking monolithic dispatch — an
    eager segment walk here would put ~6 host syncs on the keyframe
    event's critical path (advisor r4 medium); the merge lands at the
    per-frame is_ready poll exactly as before r4."""
    win = _local_window(m, kf_id)
    if win is None:
        return None
    local_kfs, fixed_kfs, pts = _trim_window(m, *win)
    packed = _assemble(cfg, m, local_kfs, fixed_kfs, pts, tied_rungs=True)
    if packed is None:
        return None
    prob, K, all_kfs, e_feat, E = packed
    if not segmented:
        res = _ba_solve_packed(prob, K)  # async dispatch, no host sync
        return LBAHandle(res, all_kfs, np.asarray(prob.kf_fixed),
                         len(local_kfs), pts, e_feat, E)
    # nothing dispatched yet: the worker calls handle.drive() OFF the
    # map lock (upload + segments + finalize all happen there)
    drive = _ba_solve_segmented_driver(prob, K)
    return LBAHandle(None, all_kfs, np.asarray(prob.kf_fixed),
                     len(local_kfs), pts, e_feat, E, driver=drive)


def apply_local_ba(handle: LBAHandle, m):
    """Merge a finished (or force-joined) async local BA into the map.
    Every write revalidates against the live map exactly like the
    synchronous path — points killed or re-observed while the solve ran
    keep their newer state (MapPoint::Replace-safe). The device readback
    happens OUTSIDE the map lock (threaded-LocalMapping mode holds it
    only for the host mutations)."""
    handle.drive()  # lazily finish a segmented solve (no-op when done)
    new_poses, new_pts, inlier_all, chi2_all = _unflatten_ba_result(
        np.asarray(handle.flat), *handle.shapes
    )
    with m.lock:
        _apply_local_ba_data(
            handle, m, new_poses, new_pts, inlier_all, chi2_all
        )


def _apply_local_ba_data(handle, m, new_poses, new_pts, inlier_all,
                         chi2_all):
    for i, k in enumerate(handle.all_kfs[: handle.n_local]):
        if not handle.kf_fixed[i] and m.kf_alive[k]:
            m.set_kf_pose(k, new_poses[i])
    pts_arr = np.asarray(handle.pts)
    alive = m.pt_alive[pts_arr]
    m.pt_pos[pts_arr[alive]] = new_pts[: len(pts_arr)][alive]
    m.mark_dirty(pts_arr[alive])

    inlier = inlier_all[: handle.E]
    for idx in np.nonzero(~inlier)[0]:
        pid, k, feat = handle.e_feat[idx]
        if m.pt_alive[pid] and m.pt_obs[pid].get(k) == feat:
            frame = m.kf_frames[k]
            frame.map_pt[feat] = -1
            m.erase_observation(pid, k)
    m.update_normal_and_depth_batch(pts_arr[alive])


def local_bundle_adjustment_vis(cfg, m, kf_id: int):
    """Optimizer::LocalBundleAdjustmentVis (Optimizer.cc:873-1293):
    local BA followed by a per-map-point quality update from the summed
    normalized chi2 over all its local observations — chi-square quantile
    windows [50%, 95%] at the point's total dof."""
    from scipy.stats import chi2 as chi2_dist

    extra = local_bundle_adjustment(cfg, m, kf_id, return_edges=True)
    if extra is None:
        return
    pts, e_feat, chi2_vals, inlier = extra
    acc = {}
    for (pid, k, feat), c2, ok in zip(e_feat, chi2_vals, inlier):
        frame = m.kf_frames[k]
        dof = 3 if frame.u_right[feat] >= 0 else 2
        tot = acc.setdefault(pid, [0.0, 0])
        tot[0] += float(c2)
        tot[1] += dof
    for pid, (chi2_sum, dof) in acc.items():
        if dof < 1 or not m.pt_alive[pid]:
            continue
        th_max = chi2_dist.ppf(0.95, dof)
        th_min = chi2_dist.ppf(0.5, dof)
        scaled = np.clip((chi2_sum - th_min) / (th_max - th_min), 0.0, 1.0)
        m.pt_quality[pid] = 2.0 * (1.0 / (1.0 + scaled)) - 1.0
        m.mark_dirty(pid)


def constrained_local_bundle_adjustment(cfg, m, kf_id: int):
    """Optimizer::ConstrainedLocalBundleAdjustment (Optimizer.cc:1295-1751):
    "guided BA" — keyframe poses pinned to ground truth, only points
    optimized; each observation's final chi2 is mapped through the
    [kErrMin=1.0, kErrMax=7.815] window into a keypoint quality label."""
    local_kfs = [kf_id] + [k for k, _ in m.covisible_keyframes(kf_id)]
    local_kfs = [k for k in local_kfs if m.kf_alive[k]]
    # pin every pose to its GT (camera-to-world inverted to Tcw)
    gt_ok = all(m.kf_gt_pose[k] is not None for k in local_kfs)
    if not gt_ok or len(local_kfs) < 2:
        return
    saved = {k: m.kf_pose[k].copy() for k in local_kfs}
    for k in local_kfs:
        m.set_kf_pose(k, np.linalg.inv(m.kf_gt_pose[k]).astype(np.float32))
    pts = set()
    for k in local_kfs:
        frame = m.kf_frames[k]
        for pid in frame.map_pt[frame.map_pt >= 0]:
            if m.pt_alive[pid]:
                pts.add(int(pid))
    pts = sorted(pts)
    extra = _run_ba(
        cfg, m, local_kfs, [], pts, erase_outliers=False,
        extra_fixed=set(local_kfs), return_edges=True, tied_rungs=True,
    )
    if extra is None:
        for k, T in saved.items():
            m.set_kf_pose(k, T)
        return
    _, e_feat, chi2_vals, _ = extra
    K_ERR_MIN, K_ERR_MAX = 1.0, 7.815
    for (pid, k, feat), c2 in zip(e_feat, chi2_vals):
        if m.n_observations(pid) <= 2:
            continue
        frame = m.kf_frames[k]
        scaled = np.clip(
            (float(c2) - K_ERR_MIN) / (K_ERR_MAX - K_ERR_MIN), 0.0, 1.0
        )
        frame.qual_score[feat] = 2.0 * (1.0 / (1.0 + scaled)) - 1.0


def global_bundle_adjustment(cfg, m, n_iters: int = 20, fixed_kfs=()):
    """Optimizer::GlobalBundleAdjustemnt (Optimizer.cc:51-63): BA over every
    live keyframe and point; only the origin keyframe (and any explicitly
    fixed ones) anchored. Used after loop closure and mono initialization."""
    alive_kfs = [k for k in range(m.n_keyframes) if m.kf_alive[k]]
    if len(alive_kfs) < 2:
        return
    pts = [p for p in range(m.n_points) if m.pt_alive[p] and m.pt_obs[p]]
    # the reference's global BA is ONE robust run: no midpoint outlier
    # reclassification, Huber kept throughout (Optimizer.cc:51-249)
    _run_ba(
        cfg, m, alive_kfs, [], pts,
        n_iters1=n_iters // 2, n_iters2=n_iters - n_iters // 2,
        erase_outliers=False, extra_fixed=set(fixed_kfs),
        kernel2=True, midpoint_gate=False,
    )


class GBAHandle:
    """In-flight deferred global BA (the reference's GBA thread,
    LoopClosing.cc:584): the device program is dispatched asynchronously
    (XLA dispatch returns futures); the host applies the result later via
    apply_global_ba, propagating corrections to keyframes/points created
    while it ran (RunGlobalBundleAdjustment, LoopClosing.cc:649-745)."""

    def __init__(self, res, kf_ids, pt_in_snapshot, n_points_snapshot):
        self.res = res                       # BAResult (device arrays)
        self.kf_ids = kf_ids                 # snapshot keyframe ids
        self.pt_in_snapshot = pt_in_snapshot  # (n_points_snapshot,) bool
        self.n_points_snapshot = n_points_snapshot


def global_bundle_adjustment_async(cfg, m, n_iters: int = 20,
                                   fixed_kfs=()):
    """Dispatch global BA on the device WITHOUT blocking; returns a
    GBAHandle (or None if degenerate). Tracking keeps running against the
    uncorrected map — the reference's concurrent-GBA semantics."""
    alive_kfs = [k for k in range(m.n_keyframes) if m.kf_alive[k]]
    if len(alive_kfs) < 2:
        return None
    pts = [p for p in range(m.n_points) if m.pt_alive[p] and m.pt_obs[p]]
    packed = _assemble(cfg, m, alive_kfs, [], pts,
                       extra_fixed=set(fixed_kfs), rung_table=GBA_RUNGS)
    if packed is None:
        return None
    prob, K, all_kfs, _e_feat, _E = packed
    res = _ba_solve_packed(
        prob, K, n_iters1=n_iters // 2, n_iters2=n_iters - n_iters // 2,
        kernel2=True, midpoint_gate=False,
    )  # async dispatch: no host sync here
    in_snap = np.zeros(m.n_points, bool)
    in_snap[np.asarray(pts)] = True
    return GBAHandle(res, list(all_kfs), in_snap, m.n_points)


def apply_global_ba(handle: GBAHandle, m):
    """Merge a finished GBA into a map that kept growing — the
    reference's RunGlobalBundleAdjustment merge (LoopClosing.cc:649-745):

    * snapshot keyframes take their optimized poses (mTcwGBA);
    * keyframes created during GBA are corrected through the spanning
      tree: T_new = (T_child @ T_parent_before^-1) @ T_parent_GBA, parent
      = max-covisibility already-corrected keyframe (how the reference's
      spanning tree is built), processed in id order;
    * snapshot map points take their optimized positions (mPosGBA);
      points created during GBA ride their reference keyframe's
      before->after delta (backproject with TcwBefGBA, reproject with
      the corrected pose).
    """
    import jax

    new_kf_poses, new_pt_pos = jax.device_get(  # blocks until GBA done
        (handle.res.kf_pose, handle.res.pt_pos)
    )
    with m.lock:
        _apply_global_ba_data(handle, m, new_kf_poses, new_pt_pos)


def _apply_global_ba_data(handle, m, new_kf_poses, new_pt_pos):
    slot = {k: i for i, k in enumerate(handle.kf_ids)}

    before = {}
    for k, i in slot.items():
        if not m.kf_alive[k]:
            continue
        before[k] = m.kf_pose[k].copy()
        m.set_kf_pose(k, new_kf_poses[i])
    corrected = set(before)

    # keyframes created while GBA ran
    new_kfs = [k for k in range(m.n_keyframes)
               if m.kf_alive[k] and k not in slot]
    for k in sorted(new_kfs):
        parent, best_w = -1, -1
        for nb, w in m.covisible_keyframes(k):
            if nb in corrected and w > best_w:
                parent, best_w = nb, w
        if parent < 0:
            cand = [c for c in corrected if c < k]
            if not cand:
                continue
            parent = max(cand)
        T_child = m.kf_pose[k].copy()
        T_new = (T_child @ np.linalg.inv(before[parent])
                 @ m.kf_pose[parent]).astype(np.float32)
        before[k] = T_child
        m.set_kf_pose(k, T_new)
        corrected.add(k)

    for pid in range(m.n_points):
        if not m.pt_alive[pid]:
            continue
        if pid < handle.n_points_snapshot and handle.pt_in_snapshot[pid]:
            # find its slot: snapshot points were packed in sorted order
            continue  # handled vectorized below
        ref = int(m.pt_ref_kf[pid])
        if ref not in before:
            continue
        pc = before[ref][:3, :3] @ m.pt_pos[pid] + before[ref][:3, 3]
        Twc = np.linalg.inv(m.kf_pose[ref])
        m.pt_pos[pid] = (Twc[:3, :3] @ pc + Twc[:3, 3]).astype(np.float32)

    snap_ids = np.nonzero(handle.pt_in_snapshot)[0]
    alive = m.pt_alive[snap_ids]
    m.pt_pos[snap_ids[alive]] = new_pt_pos[: len(snap_ids)][alive]
    m.update_normal_and_depth_batch(snap_ids[alive])
    m.mark_all_dirty()  # a global merge rewrites most live rows

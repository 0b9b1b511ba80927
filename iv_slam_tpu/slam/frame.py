"""Per-frame data bundle + the stereo frontend that fills it.

Replaces the reference's Frame class (Frame.cc:89-230 stereo ctor): ORB
extraction on both images, stereo matching, quality-score seeding. The
reference runs left/right extraction on two CPU threads (Frame.cc:116-124);
here both images go through the extractor back-to-back as device calls (the
kernels themselves parallelize across the chip; an explicit batch axis can
be added once profiling justifies the extra compile variant).

Host-side state (pose, map-point associations, outlier flags) lives in
NumPy; the padded device arrays from extraction stay as jax arrays for the
downstream matchers/optimizers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import pyramid as pyr
from ..ops import stereo
from ..ops.extractor import Keypoints, OrbExtractor


@dataclasses.dataclass
class Frame:
    frame_id: int
    timestamp: float
    kp: Keypoints                    # device arrays, capacity N
    u_right: np.ndarray              # (N,) float32, -1 = no stereo match
    depth: np.ndarray                # (N,) float32, -1 = none
    qual_score: np.ndarray           # (N,) float32 introspection quality
    pose: Optional[np.ndarray] = None      # (4, 4) Tcw
    map_pt: Optional[np.ndarray] = None    # (N,) int32 map-point id or -1
    outlier: Optional[np.ndarray] = None   # (N,) bool
    ref_kf: int = -1
    gt_pose: Optional[np.ndarray] = None   # (4, 4) Twc ground truth
    gt_cov: Optional[np.ndarray] = None    # (6, 6)
    # per-keypoint GT depth (mvKeysGTDepth, Frame.cc:152-191): 5x5 patch-min
    # of the GT depth image at each keypoint; -1 where unavailable
    kp_gt_depth: Optional[np.ndarray] = None
    img_name: str = ""
    # cached numpy views of the keypoint arrays (host bookkeeping)
    xy: np.ndarray = None
    octave: np.ndarray = None
    valid: np.ndarray = None
    # defer=True keeps ALL host views on device (u_right/depth/qual_score
    # stay jax arrays) so a downstream fused-tracking dispatch can launch
    # first and ONE download later drains frame views + tracking results
    # in a single link round-trip (see Tracking._track_fused)
    defer: bool = False
    # (N, 7) device array [x, y, octave, valid, u_right, depth, qual] kept
    # for deferred frames so a fallback materialize is one RPC
    host_pack: object = None
    # device-resident copies of u_right/depth, retained PAST
    # materialization: keyframe events (triangulation, fuse) stack these
    # per-target arrays on device instead of re-uploading ~0.5 MB of
    # host float tables per event through the link
    ur_dev: object = None
    depth_dev: object = None
    _angle: np.ndarray = None
    _desc: np.ndarray = None

    def __post_init__(self):
        n = self.u_right.shape[0]
        if self.map_pt is None:
            self.map_pt = np.full(n, -1, np.int32)
        if self.outlier is None:
            self.outlier = np.zeros(n, bool)
        if self.xy is None and not self.defer:
            self._materialize(())

    def materialize(self, extras=()):
        """Download the host views (once) plus any `extras` device arrays
        in one batched transfer; returns the extras as numpy."""
        if self.xy is not None:
            if not extras:
                return ()
            import jax

            return jax.device_get(tuple(extras))
        return self._materialize(extras)

    def _materialize(self, extras):
        import jax

        if self.host_pack is not None:
            pack = np.asarray(self.host_pack)  # one RPC
            self.xy = np.ascontiguousarray(pack[:, 0:2])
            self.octave = pack[:, 2].astype(np.int32)
            self.valid = pack[:, 3] != 0.0
            self.u_right = np.ascontiguousarray(pack[:, 4])
            self.depth = np.ascontiguousarray(pack[:, 5])
            self.qual_score = np.ascontiguousarray(pack[:, 6])
            return jax.device_get(tuple(extras)) if extras else ()
        out = jax.device_get(
            (self.kp.xy, self.kp.octave, self.kp.valid,
             self.u_right, self.depth, self.qual_score) + tuple(extras)
        )
        self.xy, self.octave, self.valid = out[0], out[1], out[2]
        self.u_right, self.depth, self.qual_score = out[3], out[4], out[5]
        return out[6:]

    @property
    def desc(self) -> np.ndarray:
        """Host descriptor view — downloaded lazily: only keyframes (map
        bookkeeping, fusion) need descriptors on the host."""
        if self._desc is None:
            self._desc = np.asarray(self.kp.desc)
        return self._desc

    @property
    def angle(self) -> np.ndarray:
        if self._angle is None:
            self._angle = np.asarray(self.kp.angle)
        return self._angle

    @property
    def n_valid(self) -> int:
        return int(self.valid.sum())

    def set_pose(self, T: np.ndarray):
        self.pose = np.asarray(T, np.float32).copy()

    def camera_center(self) -> np.ndarray:
        R = self.pose[:3, :3]
        return -R.T @ self.pose[:3, 3]

    def unproject_stereo(self, i: int, fx, fy, cx, cy) -> Optional[np.ndarray]:
        """Backproject keypoint i via its stereo depth into world coords
        (Frame::UnprojectStereo, Frame.cc:958-977)."""
        z = float(self.depth[i])
        if z <= 0:
            return None
        u, v = self.xy[i]
        x = (u - cx) * z / fx
        y = (v - cy) * z / fy
        pc = np.array([x, y, z, 1.0], np.float32)
        Twc = np.linalg.inv(self.pose)
        return (Twc @ pc)[:3]


def sample_gt_depth(
    depth_map: np.ndarray, xy: np.ndarray, valid: np.ndarray,
    patch: int = 5, max_depth: float = 600.0,
) -> np.ndarray:
    """Per-keypoint ground-truth depth as the minimum over a 5x5 patch
    around the keypoint (Frame.cc:152-191 mvKeysGTDepth; sky masked at
    600 m). Returns (N,) float32; -1 where invalid."""
    h, w = depth_map.shape
    half = patch // 2
    out = np.full(len(xy), -1.0, np.float32)
    for i in np.nonzero(valid)[0]:
        px = int(round(float(xy[i, 0])))
        py = int(round(float(xy[i, 1])))
        x0, y0 = max(px - half, 0), max(py - half, 0)
        p = depth_map[y0:y0 + patch, x0:x0 + patch]
        if p.size:
            d = float(p.min())
            if d < max_depth:
                out[i] = d
    return out


class MonoFrontend:
    """Monocular frame builder (Frame.cc:308-413 mono ctor): extraction
    only; stereo fields stay at -1."""

    def __init__(self, cfg: Config, height: int, width: int):
        self.cfg = cfg
        self.extractor = OrbExtractor(cfg.orb, height, width)
        self._frame_count = 0

    def process(
        self,
        img: np.ndarray,
        timestamp: float,
        cost_map: Optional[np.ndarray] = None,
        gt_pose: Optional[np.ndarray] = None,
        img_name: str = "",
    ) -> Frame:
        q = jnp.asarray(cost_map) if cost_map is not None else None
        kp = self.extractor(jnp.asarray(img), q)
        n = int(kp.xy.shape[0])
        if cost_map is not None:
            xy = np.asarray(kp.xy)
            xs = np.clip(np.rint(xy[:, 0]).astype(int), 0, cost_map.shape[1] - 1)
            ys = np.clip(np.rint(xy[:, 1]).astype(int), 0, cost_map.shape[0] - 1)
            cost = cost_map[ys, xs].astype(np.float32)
            qual = 2.0 * (1.0 / (1.0 + cost / 256.0)) - 1.0
        else:
            qual = np.ones(n, np.float32)
        fid = self._frame_count
        self._frame_count += 1
        return Frame(
            frame_id=fid,
            timestamp=timestamp,
            kp=kp,
            u_right=np.full(n, -1.0, np.float32),
            depth=np.full(n, -1.0, np.float32),
            qual_score=qual,
            gt_pose=gt_pose,
            img_name=img_name,
        )


class RGBDFrontend:
    """RGB-D frame builder (Frame.cc:232-305 RGBD ctor): depth sampled at
    keypoint pixels; virtual right coordinate u_r = u - bf / depth."""

    def __init__(self, cfg: Config, height: int, width: int):
        self.cfg = cfg
        self.extractor = OrbExtractor(cfg.orb, height, width)
        self._frame_count = 0

    def process(
        self,
        img: np.ndarray,
        depth_map: np.ndarray,
        timestamp: float,
        depth_scale: float = 1.0,
        img_name: str = "",
    ) -> Frame:
        kp = self.extractor(jnp.asarray(img))
        n = int(kp.xy.shape[0])
        xy = np.asarray(kp.xy)
        xs = np.clip(np.rint(xy[:, 0]).astype(int), 0, depth_map.shape[1] - 1)
        ys = np.clip(np.rint(xy[:, 1]).astype(int), 0, depth_map.shape[0] - 1)
        depth = depth_map[ys, xs].astype(np.float32) * depth_scale
        valid_d = depth > 0
        u_right = np.where(
            valid_d, xy[:, 0] - self.cfg.camera.bf / np.maximum(depth, 1e-6),
            -1.0,
        ).astype(np.float32)
        depth = np.where(valid_d, depth, -1.0).astype(np.float32)
        fid = self._frame_count
        self._frame_count += 1
        return Frame(
            frame_id=fid,
            timestamp=timestamp,
            kp=kp,
            u_right=u_right,
            depth=depth,
            qual_score=np.ones(n, np.float32),
            img_name=img_name,
        )


class StereoFrontend:
    """Builds Frames from stereo pairs.

    The reference runs left/right ORB extraction on two CPU threads and
    stereo matching after (Frame.cc:89-230); here the WHOLE frontend —
    both pyramids, both extractions, stereo matching, quality seeding —
    is one jitted device program per frame: a single dispatch and a single
    host round-trip (critical when the accelerator sits behind a
    high-latency link)."""

    def __init__(self, cfg: Config, height: int, width: int):
        self.cfg = cfg
        self.extractor = OrbExtractor(cfg.orb, height, width)
        self.shapes = self.extractor.shapes
        self.scale_factors = jnp.asarray(cfg.orb.scale_factors())
        self.level_widths = jnp.asarray(
            np.array([s[1] for s in self.shapes], np.int32)
        )
        offs = np.cumsum([0] + [s[0] for s in self.shapes[:-1]]).astype(np.int32)
        self.level_offsets = jnp.asarray(offs)
        self._frame_count = 0
        import jax

        self._jit_plain = jax.jit(
            lambda il, ir: self._step(il, ir, None)
        )
        self._jit_qual = jax.jit(self._step)
        self._fcn = None

    def attach_introspection(self, model, variables, net_hw=(512, 512)):
        """Fuse FCN cost-map inference INTO the frontend program: raw
        image -> MobileNetV2+C1-DeepSup cost map -> weighted extraction as
        ONE dispatch (the reference runs the TorchScript forward as a
        separate GPU round-trip per frame, stereo_kitti.cc:492-517, then
        hands the byte map to TrackStereo)."""
        import jax

        from ..models.introspection import inference_cost_map

        def step(il, ir, variables):
            rgb = jnp.stack([il] * 3, axis=-1)
            cost = inference_cost_map(
                model, variables, rgb, (il.shape[0], il.shape[1]), net_hw
            )
            return self._step(il, ir, cost)

        self._fcn = (jax.jit(step), variables)

    def _step(self, il, ir, cost_map):
        import jax

        cam = self.cfg.camera
        pl = pyr.build_pyramid(il, self.shapes)
        prr = pyr.build_pyramid(ir, self.shapes)
        # left/right as ONE batch axis through the extractor (the
        # reference's two extraction threads, Frame.cc:116-124); the right
        # image gets a zero cost map = exact unweighted semantics
        levels = [jnp.stack([a, b]) for a, b in zip(pl, prr)]
        if cost_map is not None:
            ql = pyr.build_pyramid(cost_map, self.shapes)
            qlevels = [jnp.stack([q, jnp.zeros_like(q)]) for q in ql]
        else:
            qlevels = None
        kb, canvas = self.extractor.extract_from_pyramid_batched(
            levels, qlevels, return_canvas=True
        )
        kl = jax.tree.map(lambda a: a[0], kb)
        kr = jax.tree.map(lambda a: a[1], kb)
        canvas_l, canvas_r = canvas[0], canvas[1]
        use_pallas_sad = (
            getattr(self.cfg.orb, "sad_path", "pallas") == "pallas"
            and jax.default_backend() != "cpu"
        )
        u_right, depth = stereo.match_stereo(
            kl.xy, kl.octave, kl.desc, kl.valid,
            kr.xy, kr.octave, kr.desc, kr.valid,
            canvas_l, canvas_r, self.level_offsets, self.level_widths,
            self.scale_factors, jnp.float32(cam.bf), jnp.float32(cam.baseline),
            use_pallas_sad=use_pallas_sad,
        )
        if cost_map is not None:
            # seed per-keypoint quality from the cost map at the keypoint
            # pixel: qual = 2/(1 + cost/256) - 1 (Frame.cc:130-143; note the
            # reference uses /256 here vs /255 in the extractor weighting)
            xs = jnp.clip(
                jnp.rint(kl.xy[:, 0]).astype(jnp.int32), 0, cam.width - 1
            )
            ys = jnp.clip(
                jnp.rint(kl.xy[:, 1]).astype(jnp.int32), 0, cam.height - 1
            )
            cost = cost_map[ys, xs].astype(jnp.float32)
            qual = 2.0 * (1.0 / (1.0 + cost / 256.0)) - 1.0
        else:
            qual = jnp.ones(kl.xy.shape[0], jnp.float32)
        # ALL host-bound per-frame fields as ONE array: the tunneled
        # runtime pays a full RPC per materialized array (device_get of a
        # tuple is a serial per-leaf fetch), so the 6 host views ship as a
        # single (N, 7) download and are split on the host. int/bool
        # columns are exact in float32 (values << 2^24).
        host_pack = jnp.stack(
            [kl.xy[:, 0], kl.xy[:, 1],
             kl.octave.astype(jnp.float32),
             kl.valid.astype(jnp.float32),
             u_right, depth, qual], axis=1,
        )
        return kl, kr, u_right, depth, qual, host_pack

    def submit(
        self,
        img_left: np.ndarray,
        img_right: np.ndarray,
        cost_map: Optional[np.ndarray] = None,
    ):
        """Enqueue the device work for one frame (async). Returns a handle
        for collect(). Submitting frame n+1 before collecting frame n
        pipelines uploads/compute against the link latency."""
        pair = jnp.asarray(np.stack([img_left, img_right]))
        return self.submit_device(pair, cost_map)

    def submit_device(self, pair, cost_map: Optional[np.ndarray] = None):
        """submit() for an already-device-resident (2, H, W) stereo pair —
        the staged-replay path (images pre-uploaded in batches so the
        per-frame transfer leaves the tracking critical path)."""
        il, ir = pair[0], pair[1]
        if cost_map is not None:
            return self._jit_qual(il, ir, jnp.asarray(cost_map))
        if self._fcn is not None:
            fn, variables = self._fcn
            return fn(il, ir, variables)
        return self._jit_plain(il, ir)

    def prefetch_host(self, handle) -> None:
        """Enqueue the async device→host copy of the handle's host pack.

        On a tunneled/high-latency link, `np.asarray` in collect() pays a
        host-initiated request + response round-trip; prefetching right
        after submit() turns that into a device-initiated push that
        overlaps the next frame's upload/compute, leaving collect() a
        local cache hit. Safe to call multiple times; no-op on failure
        (older jax Array implementations)."""
        try:
            handle[-1].copy_to_host_async()
        except Exception:
            pass

    def collect(
        self,
        handle,
        timestamp: float,
        gt_pose: Optional[np.ndarray] = None,
        gt_cov: Optional[np.ndarray] = None,
        img_name: str = "",
        defer: bool = False,
    ) -> Frame:
        kl, kr, u_right, depth, qual, host_pack = handle
        fid = self._frame_count
        self._frame_count += 1
        if not defer:
            # ONE download (single RPC) for all small always-needed host
            # fields; descriptors and angles stay on device (lazy Frame
            # properties — only keyframes pull them)
            pack = np.asarray(host_pack)
            xy = np.ascontiguousarray(pack[:, 0:2])
            octave = pack[:, 2].astype(np.int32)
            valid = pack[:, 3] != 0.0
            u_right = np.ascontiguousarray(pack[:, 4])
            depth = np.ascontiguousarray(pack[:, 5])
            qual = np.ascontiguousarray(pack[:, 6])
        else:
            xy = octave = valid = None
        return Frame(
            frame_id=fid,
            timestamp=timestamp,
            kp=kl,
            u_right=u_right,
            depth=depth,
            qual_score=qual,
            gt_pose=gt_pose,
            gt_cov=gt_cov,
            img_name=img_name,
            xy=xy, octave=octave, valid=valid,
            defer=defer,
            host_pack=host_pack if defer else None,
            ur_dev=handle[2], depth_dev=handle[3],
        )

    def process(
        self,
        img_left: np.ndarray,
        img_right: np.ndarray,
        timestamp: float,
        cost_map: Optional[np.ndarray] = None,
        gt_pose: Optional[np.ndarray] = None,
        gt_cov: Optional[np.ndarray] = None,
        img_name: str = "",
        defer: bool = False,
    ) -> Frame:
        """Synchronous submit + collect (the per-frame tracking path)."""
        handle = self.submit(img_left, img_right, cost_map)
        return self.collect(handle, timestamp, gt_pose, gt_cov, img_name,
                            defer=defer)

"""Device-resident map mirror for fused tracking.

The multi-dispatch tracking path uploads map-point slices (positions,
descriptors, normals) on every matcher call — each upload pays a full link
round-trip. This mirror keeps fixed-capacity map tables resident in device
memory and re-uploads only when the host map changes materially (keyframe
insertion, bundle adjustment, loop correction): tracking-frame dispatches
then carry no map payload at all.

The capacity is static (pow-2 slots) so every downstream program compiles
once. Dead points are masked by `valid`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _splice(packed, desc, valid, packed_rows, desc_rows, valid_rows):
    """Write the first n rows of the persistent tables.

    NOT donated: the keyframe-event worker gathers fuse candidates from
    these tables while the tracking thread syncs them (and vice versa) —
    donation would invalidate a buffer the other thread's just-captured
    view still references. The copy costs ~2 MB of device memory per
    sync; in-flight programs keep old buffers alive until they retire."""
    return (
        jax.lax.dynamic_update_slice(packed, packed_rows, (0, 0)),
        jax.lax.dynamic_update_slice(desc, desc_rows, (0, 0)),
        jax.lax.dynamic_update_slice(valid, valid_rows, (0,)),
    )


@jax.jit
def _scatter(packed, desc, valid, idx, packed_rows, desc_rows, valid_rows):
    """Scatter-update individual rows of the persistent tables (the delta
    sync). Padded slots carry idx == capacity and are dropped. Not
    donated — see _splice."""
    return (
        packed.at[idx].set(packed_rows, mode="drop"),
        desc.at[idx].set(desc_rows, mode="drop"),
        valid.at[idx].set(valid_rows, mode="drop"),
    )


class DeviceMap:
    def __init__(self, capacity: int = 32768):
        self.capacity = capacity
        self._version = -1
        self._packed = jnp.zeros((capacity, 9), jnp.float32)
        self.desc = jnp.zeros((capacity, 32), jnp.uint8)
        self.valid = jnp.zeros(capacity, bool)
        self._reslice()
        self.live_cap = 1024
        self._views = (
            self.pos[:1024], self.desc[:1024], self.normal[:1024],
            self.min_dist[:1024], self.max_dist[:1024], self.quality[:1024],
            self.valid[:1024],
        )

    def _reslice(self):
        dev = self._packed
        self.pos = dev[:, 0:3]
        self.normal = dev[:, 3:6]
        self.min_dist = dev[:, 6]
        self.max_dist = dev[:, 7]
        self.quality = dev[:, 8]

    # delta-sync row buckets: pow-4 ladder, each a prewarmable shape; a
    # dirty set larger than the top bucket falls back to the full splice
    DELTA_RUNGS = (256, 1024, 4096)

    def sync(self, m, force: bool = False):
        """Upload the live point tables from the host MapStore after
        keyframe insertion / BA / loop correction.

        Only rows [0, n_points) change (the arena is append-only; dead
        points flip `valid` in place), so the upload is bucketed to the
        next power of two of the live count and spliced into the
        persistent full-capacity tables on device — the fused-tracking
        program keeps one static shape while early-session syncs ship
        ~10-30x less than the 32k-capacity tables."""
        n = min(m.n_points, self.capacity)
        # coarse x4 rungs (1k/4k/16k/capacity): each live-view size change
        # recompiles the big fused-tracking program through the remote
        # compile link, so the ladder is kept to <= 4 shapes per session —
        # all prewarmable at startup (slam/prewarm.py)
        cap = 1024
        while cap < n:
            cap *= 4
        cap = min(cap, self.capacity)
        # ---- delta path: when the live bucket is unchanged and the host
        # tracked which rows mutated (MapStore._dirty), scatter just those
        # rows — a keyframe event touches O(100-2k) of the O(10k) live
        # rows, so the recurring sync upload shrinks 5-20x.
        if not force and cap == self.live_cap:
            idx = m.take_dirty(n, self.DELTA_RUNGS[-1])
            if idx is not None:
                if len(idx):
                    self._scatter_rows(m, idx)
                return
        else:
            m.take_dirty(n, -1)  # consume: the full splice covers it
        packed = np.zeros((cap, 9), np.float32)
        desc = np.zeros((cap, 32), np.uint8)
        valid = np.zeros(cap, bool)
        packed[:n, 0:3] = m.pt_pos[:n]
        packed[:n, 3:6] = m.pt_normal[:n]
        packed[:n, 6] = m.pt_min_dist[:n]
        packed[:n, 7] = m.pt_max_dist[:n]
        packed[:n, 8] = m.pt_quality[:n]
        desc[:n] = m.pt_desc[:n]
        valid[:n] = m.pt_alive[:n]
        self._packed, self.desc, self.valid = _splice(
            self._packed, self.desc, self.valid,
            jnp.asarray(packed), jnp.asarray(desc), jnp.asarray(valid),
        )
        self._reslice()
        # bucketed live views: downstream fused-tracking programs run on
        # the pow-2 slice that covers the live arena instead of the full
        # capacity — compute + HBM traffic scale with the real map size
        # (a handful of compile variants over the session). Slot indices
        # into the slice equal full-table indices (append-only arena).
        self.live_cap = cap
        self._views = (
            self.pos[:cap], self.desc[:cap], self.normal[:cap],
            self.min_dist[:cap], self.max_dist[:cap], self.quality[:cap],
            self.valid[:cap],
        )

    def _scatter_rows(self, m, idx):
        """Upload only the dirty rows (idx) and scatter them into the
        persistent tables; idx is padded to the smallest DELTA_RUNGS
        bucket (fixed shapes -> no recompiles; pads carry idx=capacity,
        dropped by the scatter)."""
        k = len(idx)
        cap = next(r for r in self.DELTA_RUNGS if r >= k)
        pidx = np.full(cap, self.capacity, np.int32)
        pidx[:k] = idx
        packed = np.zeros((cap, 9), np.float32)
        packed[:k, 0:3] = m.pt_pos[idx]
        packed[:k, 3:6] = m.pt_normal[idx]
        packed[:k, 6] = m.pt_min_dist[idx]
        packed[:k, 7] = m.pt_max_dist[idx]
        packed[:k, 8] = m.pt_quality[idx]
        desc = np.zeros((cap, 32), np.uint8)
        desc[:k] = m.pt_desc[idx]
        valid = np.zeros(cap, bool)
        valid[:k] = m.pt_alive[idx]
        self._packed, self.desc, self.valid = _scatter(
            self._packed, self.desc, self.valid,
            jnp.asarray(pidx), jnp.asarray(packed), jnp.asarray(desc),
            jnp.asarray(valid),
        )
        self._reslice()
        self._views = (
            self.pos[:self.live_cap], self.desc[:self.live_cap],
            self.normal[:self.live_cap], self.min_dist[:self.live_cap],
            self.max_dist[:self.live_cap], self.quality[:self.live_cap],
            self.valid[:self.live_cap],
        )

    def live_views(self):
        """(pos, desc, normal, min_dist, max_dist, quality, valid) sliced
        to the current pow-2 live bucket."""
        return self._views

    def full_views(self):
        """(pos, desc, normal, min_dist, max_dist, valid) at FULL
        capacity — constant shapes regardless of the live rung, so
        programs that gather rows by index (the keyframe-event fuse)
        compile once per session instead of once per rung."""
        return (self.pos, self.desc, self.normal, self.min_dist,
                self.max_dist, self.valid)

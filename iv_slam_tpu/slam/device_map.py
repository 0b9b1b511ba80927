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

import numpy as np
import jax.numpy as jnp


class DeviceMap:
    def __init__(self, capacity: int = 32768):
        self.capacity = capacity
        self._version = -1
        self.pos = jnp.zeros((capacity, 3), jnp.float32)
        self.desc = jnp.zeros((capacity, 32), jnp.uint8)
        self.normal = jnp.zeros((capacity, 3), jnp.float32)
        self.min_dist = jnp.zeros(capacity, jnp.float32)
        self.max_dist = jnp.zeros(capacity, jnp.float32)
        self.quality = jnp.ones(capacity, jnp.float32)
        self.valid = jnp.zeros(capacity, bool)

    def sync(self, m, force: bool = False):
        """Upload the live point tables from the host MapStore. One stacked
        transfer; call after keyframe insertion / BA / loop correction."""
        n = min(m.n_points, self.capacity)
        pos = np.zeros((self.capacity, 3), np.float32)
        desc = np.zeros((self.capacity, 32), np.uint8)
        normal = np.zeros((self.capacity, 3), np.float32)
        mind = np.zeros(self.capacity, np.float32)
        maxd = np.zeros(self.capacity, np.float32)
        qual = np.ones(self.capacity, np.float32)
        valid = np.zeros(self.capacity, bool)
        pos[:n] = m.pt_pos[:n]
        desc[:n] = m.pt_desc[:n]
        normal[:n] = m.pt_normal[:n]
        mind[:n] = m.pt_min_dist[:n]
        maxd[:n] = m.pt_max_dist[:n]
        qual[:n] = m.pt_quality[:n]
        valid[:n] = m.pt_alive[:n]
        # one stacked upload (pack the float tables together)
        packed = np.concatenate(
            [pos, normal, mind[:, None], maxd[:, None], qual[:, None]], axis=1
        )
        dev = jnp.asarray(packed)
        self.pos = dev[:, 0:3]
        self.normal = dev[:, 3:6]
        self.min_dist = dev[:, 6]
        self.max_dist = dev[:, 7]
        self.quality = dev[:, 8]
        self.desc = jnp.asarray(desc)
        self.valid = jnp.asarray(valid)

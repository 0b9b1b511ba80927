"""Multi-chip offline replay: the stereo frontend sharded over a mesh.

The online tracking loop is frame-recurrent (SURVEY.md §7 hard part 4) and
runs on one chip; the OFFLINE passes — training-data generation scoring,
batch evaluation, dataset pre-extraction — are embarrassingly parallel
across frames. This module maps that parallelism onto a device mesh the
jax way: stack B stereo pairs, shard the batch axis over 'dp', and run the
full frontend (pyramids, both extractions, stereo matching) as ONE pjit'd
program; XLA partitions every kernel over the mesh with no collectives on
the steady-state path (the frontend is pointwise in the batch axis).

The reference has no analogue — its offline replay is the same
single-threaded binary run per session (scripts/run_*_batch*.bash); the
closest mechanism is the DataLoader worker pool (SURVEY.md §2e row 7).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..slam.frame import StereoFrontend


def make_replay_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the available chips."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("dp",))


class ShardedReplay:
    """Frontend fan-out over a mesh for offline batch processing.

    process_batch(lefts, rights) consumes (B, H, W) uint8 stacks with B a
    multiple of the mesh size and returns the per-frame keypoint bundles
    (host numpy), computed B-ways data-parallel.
    """

    def __init__(self, cfg: Config, height: int, width: int,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh or make_replay_mesh()
        self.frontend = StereoFrontend(cfg, height, width)
        data = NamedSharding(self.mesh, P("dp"))

        step = jax.vmap(lambda il, ir: self.frontend._step(il, ir, None))
        self._fn = jax.jit(
            step, in_shardings=(data, data),
        )

    def process_batch(self, lefts: np.ndarray, rights: np.ndarray):
        """(B, H, W) x2 -> list of B dicts of host arrays (keypoints,
        stereo depth, quality)."""
        b = lefts.shape[0]
        n_dev = len(self.mesh.devices.ravel())
        if b % n_dev != 0:
            pad = n_dev - b % n_dev
            lefts = np.concatenate([lefts, lefts[-1:].repeat(pad, 0)])
            rights = np.concatenate([rights, rights[-1:].repeat(pad, 0)])
        kl, kr, u_right, depth, qual, _pack = self._fn(
            jnp.asarray(lefts), jnp.asarray(rights)
        )
        # one batched download for the whole replay slab
        xy, octave, valid, desc, angle, ur, dp_, q = jax.device_get(
            (kl.xy, kl.octave, kl.valid, kl.desc, kl.angle,
             u_right, depth, qual)
        )
        out = []
        for i in range(b):
            out.append(dict(
                xy=xy[i], octave=octave[i], valid=valid[i], desc=desc[i],
                angle=angle[i], u_right=ur[i], depth=dp_[i], qual=q[i],
            ))
        return out

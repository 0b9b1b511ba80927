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
                 mesh: Optional[Mesh] = None, vocabulary=None):
        self.cfg = cfg
        self.mesh = mesh or make_replay_mesh()
        self.frontend = StereoFrontend(cfg, height, width)
        self.vocabulary = vocabulary
        data = NamedSharding(self.mesh, P("dp"))

        if vocabulary is not None:
            # vocabulary arrays ride along replicated; the tree descent
            # (ops/bow.py) is pointwise in the batch axis so it shards
            # over 'dp' with the rest of the frontend — BoW words come
            # back in the same program (no per-frame host tree walks)
            from ..ops import bow as bow_ops

            voc_children = jnp.asarray(vocabulary.children)
            voc_desc = jnp.asarray(vocabulary.node_desc)
            depth_l = int(vocabulary.L)

            def one(il, ir):
                kl, kr, u_right, depth, qual, pack = self.frontend._step(
                    il, ir, None
                )
                words = bow_ops.transform_words(
                    voc_children, voc_desc, kl.desc, depth_l
                )
                return kl, kr, u_right, depth, qual, pack, words
        else:
            def one(il, ir):
                return self.frontend._step(il, ir, None) + (None,)

        self._fn = jax.jit(
            jax.vmap(one), in_shardings=(data, data),
        )

    def process_batch(self, lefts: np.ndarray, rights: np.ndarray):
        """(B, H, W) x2 -> list of B dicts of host arrays (keypoints,
        stereo depth, quality; + BoW leaf-node ids when a vocabulary is
        attached)."""
        b = lefts.shape[0]
        n_dev = len(self.mesh.devices.ravel())
        if b % n_dev != 0:
            pad = n_dev - b % n_dev
            lefts = np.concatenate([lefts, lefts[-1:].repeat(pad, 0)])
            rights = np.concatenate([rights, rights[-1:].repeat(pad, 0)])
        kl, kr, u_right, depth, qual, _pack, words = self._fn(
            jnp.asarray(lefts), jnp.asarray(rights)
        )
        # one batched download for the whole replay slab
        fields = (kl.xy, kl.octave, kl.valid, kl.desc, kl.angle,
                  u_right, depth, qual)
        if words is not None:
            fields = fields + (words,)
        got = jax.device_get(fields)
        xy, octave, valid, desc, angle, ur, dp_, q = got[:8]
        w = got[8] if words is not None else None
        out = []
        for i in range(b):
            rec = dict(
                xy=xy[i], octave=octave[i], valid=valid[i], desc=desc[i],
                angle=angle[i], u_right=ur[i], depth=dp_[i], qual=q[i],
            )
            if w is not None:
                rec["bow_nodes"] = np.where(valid[i], w[i], -1)
            out.append(rec)
        return out

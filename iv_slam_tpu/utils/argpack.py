"""Pack many small host arrays into ONE device upload.

The tunneled TPU runtime pays a full RPC per materialized array transfer
(measured ~10-45 ms each, nearly size-independent for small arrays), so a
jitted call with k host-numpy arguments costs k round trips before the
program even dispatches. The keyframe-event programs (triangulation,
fuse, local BA) take 7-15 host arrays each — upload RTT dominated the
~1 s keyframe events that remained after the round-2 compile-storm fixes
(PERF.md).

`pack_host` concatenates the host arrays into one flat float32 buffer and
returns a hashable spec; `unpack` (called INSIDE the jitted program)
rebuilds each array with static slicing, so XLA sees exactly the same
operands as before at zero runtime cost. float32 carries every dtype we
ship losslessly: bool/uint8/int32 feature indices and point ids are all
< 2^24, and float inputs are float32 already (jax default x64-off would
truncate float64 uploads identically).

Usage:
    flat, spec = argpack.pack_host([a, b, c])
    out = packed_op(jnp.asarray(flat), spec, *device_args)   # 1 upload

    @partial(jax.jit, static_argnums=(1,))
    def packed_op(flat, spec, *device_args):
        a, b, c = argpack.unpack(flat, spec)
        ...

Specs are derived from (shape, dtype) only — rung-bucketed call sites
produce one spec per rung, so packing adds no new compiled programs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

# dtype tags: canonical jnp dtypes on the unpack side
_TAGS = {
    "f": "float32",
    "i": "int32",
    "b": "bool",
    "u": "uint8",
}


def _tag(dtype: np.dtype) -> str:
    """Map a dtype to its transport tag.

    Only dtypes the float32 wire format carries LOSSLESSLY are accepted:
    float32 (and float64, which jax's x64-off mode would truncate to
    float32 anyway), signed ints (magnitude-checked < 2^24 at pack time,
    which also makes the int64->int32 downcast lossless), bool, and
    uint8. Anything else (uint16/32/64, float16, complex) would silently
    corrupt — raise instead.
    """
    dt = np.dtype(dtype)
    kind, size = dt.kind, dt.itemsize
    if kind == "f" and size in (4, 8):
        return "f"
    if kind == "i":
        return "i"
    if kind == "b":
        return "b"
    if kind == "u" and size == 1:
        return "u"
    raise TypeError(
        f"argpack: dtype {dt} is not lossless over the float32 wire "
        "(supported: float32/float64, int8/16/32, bool, uint8)")


def pack_host(arrays: Sequence[np.ndarray]) -> Tuple[np.ndarray, tuple]:
    """Concatenate host arrays into one flat float32 buffer.

    Returns (flat, spec) where spec is a hashable tuple of
    (shape, dtype_tag) usable as a jit static argument.
    """
    parts = []
    spec = []
    for a in arrays:
        a = np.asarray(a)
        t = _tag(a.dtype)
        if t == "i" and a.size and int(np.abs(a).max()) >= 2 ** 24:
            raise ValueError(
                "argpack: int array with |value| >= 2^24 cannot ride the "
                "float32 wire losslessly (max abs = %d)" % int(np.abs(a).max()))
        spec.append((a.shape, t))
        parts.append(np.ascontiguousarray(a, dtype=np.float32).reshape(-1))
    flat = (np.concatenate(parts) if parts
            else np.zeros(0, np.float32))
    return flat, tuple(spec)


def unpack(flat, spec: tuple):
    """Rebuild the packed arrays inside a traced/jitted function."""
    import jax.numpy as jnp

    out = []
    off = 0
    for shape, tag in spec:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        x = jnp.reshape(flat[off:off + n], shape)
        if tag != "f":
            x = x.astype(_TAGS[tag])
        out.append(x)
        off += n
    return out


_WRAPPED = {}


def call_packed(fn, *args, **static_kw):
    """Call ``fn(*args, **static_kw)`` with every host-numpy argument
    shipped as ONE upload.

    ``args`` may contain pytrees (NamedTuples like BAProblem). Host numpy
    leaves are packed into one flat float32 buffer; device (jax) array
    leaves and python scalars pass through untouched; ``static_kw`` values
    must be hashable and are forwarded verbatim (they become part of the
    cache key). The unpack happens inside a jit wrapper that traces
    straight through ``fn``, so per (fn, shape-set, statics) there is
    exactly ONE compiled program — the same count as calling ``fn``
    directly (rung-bucketed call sites keep the spec set finite, and
    prewarm walks the same wrappers with the same host/device residency).

    NOTE: ``fn`` must be a stable (module-level or instance-cached)
    callable — the wrapper cache is keyed on its identity.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(args)
    host_idx = tuple(
        i for i, a in enumerate(leaves) if isinstance(a, np.ndarray)
    )
    flat, spec = pack_host([leaves[i] for i in host_idx])
    key = (fn, treedef, host_idx, spec,
           tuple(sorted(static_kw.items())))
    w = _WRAPPED.get(key)
    if w is None:
        hset = frozenset(host_idx)
        n_leaves = len(leaves)

        def run(flat_dev, passthrough):
            un = iter(unpack(flat_dev, spec))
            pt = iter(passthrough)
            lv = [next(un) if i in hset else next(pt)
                  for i in range(n_leaves)]
            return fn(*jax.tree_util.tree_unflatten(treedef, lv),
                      **static_kw)

        # setdefault: prewarm daemon + tracking threads can race the first
        # call; converging on one wrapper preserves the prewarmed compile
        w = _WRAPPED.setdefault(key, jax.jit(run))
        import os

        if os.environ.get("IVT_LOG_NEW_WRAPPERS"):
            import sys as _sys
            import time as _time

            print(
                f"[argpack {_time.monotonic():.1f}] new wrapper: "
                f"{getattr(fn, '__name__', fn)} host_idx={host_idx} "
                f"spec={spec}", file=_sys.stderr, flush=True,
            )
    passthrough = tuple(
        a for i, a in enumerate(leaves) if i not in set(host_idx)
    )
    return w(jnp.asarray(flat), passthrough)

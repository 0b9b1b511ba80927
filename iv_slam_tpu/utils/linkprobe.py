"""Host<->device link characterization (one cached probe per process).

The runtime's program-shape decisions (slam/local_mapping.py chunk
sizes, solvers/local_ba.py segmentation) trade DEVICE-QUEUE occupancy
against HOST SYNCS — the right trade depends entirely on the link: on a
locally attached chip (or the CPU backend) a sync costs microseconds
and chunked worker programs open queue gaps for the tracking thread; on
a tunneled dev chip a sync costs a full RTT (measured 4 ms on a good
day, 58 ms on a bad one — PERF.md r4/r5), and every extra chunk pull
lands on the keyframe event's wall clock, starving keyframe cadence and
with it loop detection.

The reference never faces this (its CPU threads share an address
space); this probe is the TPU-native answer: measure once, pick shapes.
"""

from __future__ import annotations

import time

_RTT_MS = None


def probe_rtt_ms(n: int = 5, force: bool = False) -> float:
    """Median dispatch->download round-trip of a tiny program, in ms.
    Cached for the process (the link does not change mid-run). On the
    CPU backend this measures sub-millisecond and selects the chunked
    (low-RTT) shapes, which keeps tests on the r4 behavior."""
    global _RTT_MS
    if _RTT_MS is not None and not force:
        return _RTT_MS
    import numpy as np
    import jax.numpy as jnp

    x = jnp.ones((8, 8), jnp.float32)
    np.asarray(x @ x)  # warm the program
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(x @ x)
        samples.append(time.perf_counter() - t0)
    _RTT_MS = float(np.median(samples) * 1e3)
    return _RTT_MS


def set_rtt_ms(value) -> None:
    """Pin the probe result (tests / configs with a known link)."""
    global _RTT_MS
    _RTT_MS = None if value is None else float(value)

"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; shardings are validated on
XLA's host platform with 8 virtual devices (same program, same collectives).
Env vars must be set before the first jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import faulthandler  # noqa: E402
import sys  # noqa: E402

# watchdog: if the suite wedges (observed rare XLA-CPU hangs under the
# single-core CI), dump all thread stacks so the hang is diagnosable
faulthandler.dump_traceback_later(900, repeat=True, file=sys.stderr)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# jax may have been imported before this file (interpreter sitecustomize);
# env mutations alone are too late then — force the platform via config so
# tests really run on the virtual-CPU mesh, not a tunneled accelerator
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# The interpreter's sitecustomize installs process-wide jax hooks (a
# compile interceptor + a hidden compilation cache) whose XLA:CPU AOT
# serialization round-trips executables with mismatched CPU-feature flags
# — reloading them intermittently SIGSEGVs. Neutralize both for tests:
# restore the original compiler entry point from the wrapper's closure and
# make sure no persistent cache is configured.
import jax._src.compiler as _jcompiler  # noqa: E402

_fn = _jcompiler.backend_compile_and_load
if "axon" in getattr(_fn, "__name__", "") and _fn.__closure__:
    for _cell in _fn.__closure__:
        try:
            _v = _cell.cell_contents
        except ValueError:
            continue
        if callable(_v) and getattr(_v, "__name__", "") == "backend_compile_and_load":
            _jcompiler.backend_compile_and_load = _v
            break
jax.config.update("jax_compilation_cache_dir", None)
from jax._src import compilation_cache as _cc  # noqa: E402

_cc.reset_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# Fast-compile mode: XLA:CPU spends most of the suite's wall-clock
# compiling; disabling most HLO optimization passes keeps semantics
# identical with slower kernels but much faster compiles. Validated
# across the full non-slow suite (169 passed, 16:49 vs 22:36) and now
# the DEFAULT for tests; export IVT_FAST_COMPILE=0 to measure with full
# optimizations.
import os as _os

if _os.environ.get("IVT_FAST_COMPILE", "1") != "0":
    jax.config.update("jax_disable_most_optimizations", True)

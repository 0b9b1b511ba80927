"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; shardings are validated on
XLA's host platform with 8 virtual devices (same program, same collectives).
Env vars must be set before the first jax import.
"""

import os

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

# NOTE: the persistent compilation cache is intentionally NOT enabled here:
# this environment routes some compiles through a remote helper whose AOT
# executables carry different CPU-feature flags — reloading them segfaults
# (observed: SIGSEGV in compilation_cache.get_executable_and_time).


@pytest.fixture
def rng():
    return np.random.default_rng(42)

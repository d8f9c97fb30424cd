"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count`` (the TPU-native answer to
"multi-node tests without a cluster"); numerical parity tests also run on
CPU so torch-CPU goldens match bit-for-bit shapes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin in this image overrides the JAX_PLATFORMS env var, so
# force the CPU backend through the config API (must run before any device
# is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: CPU test compiles dominate suite latency on
# this 1-core box; caching them makes re-runs (the common case for the
# driver and for dev loops) several times faster.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The public reference implementation (read-only mount) is imported — never
# copied — as a golden oracle for parity tests.
REFERENCE_OPV2V = "/root/reference/opv2v"
REFERENCE_NUSCENES = "/root/reference/nuscenes"


def add_reference_to_path():
    for p in (REFERENCE_OPV2V, REFERENCE_NUSCENES):
        if os.path.isdir(p) and p not in sys.path:
            sys.path.insert(0, p)
    return os.path.isdir(REFERENCE_OPV2V)

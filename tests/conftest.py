"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests use the standard JAX pattern of forcing N host
platform devices so mesh-parallel code compiles and executes without TPUs
(SURVEY.md section 4). Must run before jax initializes its backends.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# A sitecustomize may have pre-registered and pinned an accelerator platform
# (and already imported jax); override in-process before any backend
# initializes so tests always run on the 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# This runner has a single CPU core; XLA compiles dominate suite time.
# The persistent compilation cache makes re-runs skip every unchanged compile.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

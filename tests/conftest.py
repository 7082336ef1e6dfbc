"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests use the standard JAX pattern of forcing N host
platform devices so mesh-parallel code compiles and executes without TPUs
(SURVEY.md section 4). Must run before jax initializes its backends.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test configuration.

JAX-dependent tests run on a virtual 8-device CPU mesh (SURVEY.md §4's
multi-host test plan): env vars must be set before jax initializes.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

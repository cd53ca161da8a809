"""Test harness: run everything on a virtual 8-device CPU mesh.

This replaces the reference's "Gloo on one box" pattern for testing
data-parallel semantics without a TPU pod (reference
``model/cm_tool/dist_util.py:31-34``).
"""

import os
import sys

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must not grab the single shared chip.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

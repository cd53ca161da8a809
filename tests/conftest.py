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


def pytest_collection_modifyitems(config, items):
    """Auto-mark the heavyweight parity/e2e modules as `slow` so the
    default quick gate is `pytest -m "not slow"` (~2 min) and the full
    suite runs nightly/pre-commit (VERDICT r2 weak #6: 17 min wall was
    gating every iteration)."""
    import pytest as _pytest

    slow_files = {
        "test_train.py", "test_torch_parity.py", "test_unet.py",
        "test_image_cm.py", "test_mos.py", "test_ldnet.py",
        "test_melgan.py", "test_ge2e_trainer.py", "test_parallel.py",
        "test_mrf_pallas.py", "test_zeroshot.py", "test_checkpoint.py",
    }
    for item in items:
        if os.path.basename(str(item.fspath)) in slow_files:
            item.add_marker(_pytest.mark.slow)

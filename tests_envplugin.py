"""Earliest-loading pytest plugin: force tests onto a virtual 8-device
CPU mesh BEFORE the JAX backend initializes.  The session environment
pins JAX_PLATFORMS=axon (the real TPU tunnel); tests must never take the
shared chip.

Loaded via ``addopts = -p tests_envplugin`` in pytest.ini; ``python -m
pytest`` puts the repo root on sys.path so this resolves.  Other
auto-loaded plugins (jaxtyping, typeguard) may import jax before this
module runs, baking the env-derived config defaults — so we also update
``jax.config`` explicitly, which is honored as long as the backend has
not yet been initialized (no devices queried at collection time).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

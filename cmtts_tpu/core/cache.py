"""Persistent XLA compilation cache.

The K-step full-unroll train graph takes minutes to compile on TPU (and
~13 min through the dev tunnel); the fused synthesis graphs compile per
(bucket, T) combination.  All of that work is deterministic given the
HLO, so JAX's persistent compilation cache turns every repeat run —
restarts, resumed training, serving redeploys, benchmarks — into a disk
load.  The reference has no equivalent (torch eager recompiles nothing,
but also fuses nothing).

Enabled for TPU-like backends only: on CPU the executables are tiny,
and cached CPU AOT artifacts are machine-feature-pinned (loading them
on a different host prints SIGILL warnings), so caching there is all
risk and no win.

Env:
  CMTTS_XLA_CACHE=0       disable
  CMTTS_XLA_CACHE=<dir>   cache directory (default ~/.cache/cmtts_tpu/xla)
"""

import os


def enable_persistent_cache():
    """Point JAX's compilation cache at a persistent directory.

    Call after importing jax and before the first jit execution.
    Returns the cache dir, or None when disabled / non-TPU backend.
    """
    spec = os.environ.get("CMTTS_XLA_CACHE", "")
    if spec == "0":
        return None

    import jax

    try:
        platform = jax.default_backend()
    except Exception:
        return None
    if platform not in ("tpu", "axon"):
        return None

    path = spec or os.path.join(
        os.path.expanduser("~"), ".cache", "cmtts_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the default 1 s floor would skip small-but-tunnel-expensive
        # graphs; cache everything that took any real compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return path

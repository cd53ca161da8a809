"""CM-TTS-TPU: a TPU-native consistency-model text-to-speech framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
XiangLi2022/CM-TTS (FastSpeech2-style conditioning network + Karras/EDM
consistency-model mel denoiser + HiFi-GAN vocoder), built TPU-first:

- all compute-path code is functional JAX, jitted with static shapes
  (length bucketing instead of dynamic padding),
- data parallelism via ``jax.sharding`` over a device ``Mesh`` (no
  NCCL/MPI translation),
- hot kernels (denoiser residual stack, vocoder MRF) are fused by XLA or
  hand-written in Pallas,
- checkpointing via Orbax with the reference's file-role structure
  (model / ema x3 / target / opt).

Reference behaviors are cited as ``file:line`` into /root/reference
throughout the docstrings.
"""

__version__ = "0.1.0"

# Honor the JAX_PLATFORMS env contract.  The container boots a
# sitecustomize hook that registers the TPU-tunnel PJRT plugin and
# force-updates jax.config's platform to the tunnel, which silently
# overrides a user's `JAX_PLATFORMS=cpu python ...` — host-side tools
# (metrics, corpus prep, zeroshot eval) then hang on a dead tunnel
# instead of running on CPU.  Re-assert the env var at package import,
# which is always before any backend is initialized in our entry
# points.  No-op when the env var is unset or already matches.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backend already initialized: leave it alone
        pass
del _os

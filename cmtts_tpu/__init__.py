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

"""Non-causal WaveNet mel denoiser, TPU-first.

Re-design of the reference Denoiser (``model/modules.py:562-638``,
``model/blocks.py:626-686``): 20 gated residual conv blocks over mel
frames.  Differences from the reference implementation (not semantics):

- channels-last (B, L, C) layout so convs/1x1s map directly onto the MXU;
- the residual stack runs under ``nn.scan`` with stacked per-block
  parameters: one compiled block body instead of 20 unrolled ones, which
  cuts compile time and lets XLA double-buffer weight fetches;
- 1x1 convolutions are Dense layers (identical math).

The continuous diffusion-step embedding is the standard interleaved-free
[sin | cos] transformer embedding on the *rescaled* sigma
(``model/blocks.py:626-640``), fed through a Mish MLP
(``modules.py:579-583``).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from cmtts_tpu.core.config import DenoiserConfig


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def diffusion_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding of a continuous step value (B,) -> (B, dim)."""
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                   * -(math.log(10000.0) / (half - 1)))
    args = t[:, None].astype(jnp.float32) * freq[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResidualBlock(nn.Module):
    """One gated WaveNet block (reference blocks.py:643-686)."""

    channels: int
    multi_speaker: bool

    @nn.compact
    def __call__(self, x, t_emb, cond, spk):
        # x: (B, L, C); t_emb: (B, C); cond: (B, L, C); spk: (B, C) or None
        C = self.channels
        t_proj = nn.Dense(C, kernel_init=nn.initializers.xavier_uniform(),
                          use_bias=False, name="t_proj")(t_emb)
        c_proj = nn.Dense(C, kernel_init=nn.initializers.he_normal(),
                          name="cond_proj")(cond)
        residual = y = x + t_proj[:, None, :]
        y = y + c_proj
        if self.multi_speaker:
            s_proj = nn.Dense(C, kernel_init=nn.initializers.xavier_uniform(),
                              use_bias=False, name="spk_proj")(spk)
            y = y + s_proj[:, None, :]
        # The reference computes one (3, C, 2C) conv then chunks into
        # gate|filter halves (blocks.py:664-668). Two separate C-wide
        # convs are the same math (and the same he_normal fan_in), but
        # keep the gated product shard-LOCAL under tensor parallelism:
        # with the fused kernel column-sharded, the chunk boundary at C
        # lands each half on a different device subset and GSPMD has to
        # reshard every block.
        gate = nn.Conv(C, (3,), padding="SAME",
                       kernel_init=nn.initializers.he_normal(),
                       name="conv_gate")(y)
        filt = nn.Conv(C, (3,), padding="SAME",
                       kernel_init=nn.initializers.he_normal(),
                       name="conv_filt")(y)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Dense(2 * C, kernel_init=nn.initializers.he_normal(),
                     name="out_proj")(y)
        res_out, skip = jnp.split(y, 2, axis=-1)
        return (res_out + residual) / math.sqrt(2.0), skip


class Denoiser(nn.Module):
    """x_t (B, L, n_mels) + rescaled t + conditioning -> model output."""

    cfg: DenoiserConfig
    n_mels: int = 80
    multi_speaker: bool = False

    @nn.compact
    def __call__(self, x, rescaled_t, cond, speaker_emb=None):
        C = self.cfg.residual_channels
        N = self.cfg.residual_layers
        # compute dtype follows the input (bf16 inference path); keep the
        # residual-scan carry dtype-consistent
        dt = x.dtype
        cond = cond.astype(dt)

        h = nn.Dense(C, kernel_init=nn.initializers.he_normal(), name="in_proj")(x)
        h = jax.nn.relu(h)

        t = diffusion_embedding(rescaled_t, C).astype(dt)
        t = nn.Dense(4 * C, kernel_init=nn.initializers.xavier_uniform(),
                     use_bias=False, name="mlp_in")(t)
        t = mish(t)
        t = nn.Dense(C, kernel_init=nn.initializers.xavier_uniform(),
                     use_bias=False, name="mlp_out")(t)

        spk = speaker_emb.astype(dt) if self.multi_speaker else None

        ScanBlock = nn.scan(
            ResidualBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=N,
            in_axes=nn.broadcast,
            out_axes=0,
            unroll=min(N, max(1, int(getattr(self.cfg, "scan_unroll", 1)))),
        )
        h, skips = ScanBlock(C, self.multi_speaker, name="blocks")(h, t, cond, spk)
        h = skips.sum(axis=0) / math.sqrt(N)

        h = nn.Dense(C, kernel_init=nn.initializers.he_normal(), name="skip_proj")(h)
        h = jax.nn.relu(h)
        # zero-init output head (reference modules.py:598)
        out = nn.Dense(self.n_mels, kernel_init=nn.initializers.zeros,
                       name="out_proj")(h)
        return out

"""HiFi-GAN discriminators (MPD + MSD) for training the vocoder, TPU-first.

The reference ships the HiFi-GAN *generator only* (``hifigan/models.py``)
and vocodes with pretrained checkpoints that are missing blobs in this
environment (``.MISSING_LARGE_BLOBS:3-5``) — a user of the rebuilt
framework therefore has no way to obtain a neural vocoder at all.  This
module supplies the training half of HiFi-GAN (Kong et al. 2020,
arXiv 2010.05646): the multi-period and multi-scale discriminator
ensembles, so ``cmtts_tpu.train.hifigan_trainer`` can train a vocoder
from scratch on any corpus (including the self-generated parametric one
used by the quality loop).

Architecture follows the paper / official config (v1):

- **MPD**: 5 sub-discriminators at periods (2,3,5,7,11).  Each reshapes
  the waveform (B, T) -> (B, T/p, p, 1) and stacks 2-D convs with kernel
  (5,1), stride (3,1), widths 32-128-512-1024-1024, then a (3,1) conv to
  1 logit channel.  Periodic structure is exactly what the TPU likes:
  the reshape is free, and (5,1) convs over a (T/p, p) grid lower to MXU
  matmuls with p as a vectorized minor dimension.
- **MSD**: 3 sub-discriminators on {x, avgpool2(x), avgpool2^2(x)} with
  grouped 1-D convs (kernel 41, groups up to 16, widths 128-1024).
  Grouped convs lower to ``feature_group_count`` in XLA and batch over
  the MXU.

All convs carry explicit weight normalization (``WNConv``): the kernel
is reparameterized as ``w = g * v / ||v||`` with per-output-channel
``g`` — the same conditioning torch's ``weight_norm`` provides, written
as a deterministic 5-line reparameterization instead of a module hook
so the param tree stays a plain pytree.  Deviation from the official
repo: the first MSD sub-discriminator uses *spectral* norm there; we
use weight norm for all three (spectral norm's power-iteration state is
a poor fit for a pure jitted step, and weight norm trains stably at
this scale — validated by the trainer's smoke/convergence tests).

Returns follow the ``(feature_list, logits)`` convention: each
sub-discriminator yields its per-layer activations (for the feature
matching loss) with the final logit map last.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

DISC_LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class HiFiGANDiscConfig:
    periods: tuple[int, ...] = (2, 3, 5, 7, 11)
    # width multiplier: 1.0 = paper scale; tests shrink it
    mpd_channels: tuple[int, ...] = (32, 128, 512, 1024, 1024)
    msd_channels: tuple[int, ...] = (128, 128, 256, 512, 1024, 1024, 1024)
    msd_groups: tuple[int, ...] = (1, 4, 16, 16, 16, 16, 1)
    msd_kernels: tuple[int, ...] = (15, 41, 41, 41, 41, 41, 5)
    msd_strides: tuple[int, ...] = (1, 2, 2, 4, 4, 1, 1)
    n_scales: int = 3


class WNConv(nn.Module):
    """Conv (1-D or 2-D by kernel rank) with explicit weight-norm
    reparameterization: w = g * v / ||v||_{all but out-channel}."""

    features: int
    kernel_size: tuple[int, ...]
    strides: tuple[int, ...] | None = None
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1] // self.feature_group_count
        v_shape = (*self.kernel_size, in_ch, self.features)
        v = self.param("v", nn.initializers.lecun_normal(), v_shape)
        # init g to ||v|| so the initial forward equals a plain conv
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                (v ** 2).sum(axis=tuple(range(v.ndim - 1)))),
            (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        norm = jnp.sqrt((v ** 2).sum(axis=tuple(range(v.ndim - 1)),
                                     keepdims=True) + 1e-12)
        w = v * (g / norm)
        if len(self.kernel_size) == 1:
            dn = ("NWC", "WIO", "NWC")
        else:
            dn = ("NHWC", "HWIO", "NHWC")
        strides = self.strides or (1,) * len(self.kernel_size)
        import jax.lax as lax

        y = lax.conv_general_dilated(
            x, w, window_strides=strides, padding="SAME",
            dimension_numbers=dn,
            feature_group_count=self.feature_group_count)
        return y + b


class PeriodDiscriminator(nn.Module):
    """One MPD branch at a fixed period p (paper fig. 2)."""

    period: int
    channels: tuple[int, ...]

    @nn.compact
    def __call__(self, wav):
        """wav (B, T) -> (features list, logits (B, T', 1))."""
        p = self.period
        B, T = wav.shape
        pad = (-T) % p
        x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(B, (T + pad) // p, p, 1)
        feats = []
        for i, ch in enumerate(self.channels):
            stride = (3, 1) if i < len(self.channels) - 1 else (1, 1)
            x = WNConv(ch, (5, 1), stride, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, DISC_LRELU_SLOPE)
            feats.append(x)
        x = WNConv(1, (3, 1), (1, 1), name="conv_post")(x)
        feats.append(x)
        return feats, x.reshape(B, -1)


class ScaleDiscriminator(nn.Module):
    """One MSD branch (paper fig. 3 / MelGAN discriminator)."""

    channels: tuple[int, ...]
    groups: tuple[int, ...]
    kernels: tuple[int, ...]
    strides: tuple[int, ...]

    @nn.compact
    def __call__(self, wav):
        """wav (B, T) -> (features list, logits (B, T'))."""
        x = wav[..., None]
        feats = []
        for i, ch in enumerate(self.channels):
            x = WNConv(ch, (self.kernels[i],), (self.strides[i],),
                       feature_group_count=self.groups[i],
                       name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, DISC_LRELU_SLOPE)
            feats.append(x)
        x = WNConv(1, (3,), (1,), name="conv_post")(x)
        feats.append(x)
        return feats, x[..., 0]


def _avg_pool1d(x, window: int = 4, stride: int = 2):
    """torch AvgPool1d(4, 2, padding=2) over (B, T)."""
    xp = jnp.pad(x, ((0, 0), (2, 2)))
    n = 1 + (xp.shape[1] - window) // stride
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(window)[None, :]
    return xp[:, idx].mean(-1)


class MultiPeriodDiscriminator(nn.Module):
    cfg: HiFiGANDiscConfig = HiFiGANDiscConfig()

    @nn.compact
    def __call__(self, wav):
        outs = []
        for p in self.cfg.periods:
            outs.append(PeriodDiscriminator(
                p, self.cfg.mpd_channels, name=f"p{p}")(wav))
        return outs  # list of (feats, logits)


class MultiScaleDiscriminator(nn.Module):
    cfg: HiFiGANDiscConfig = HiFiGANDiscConfig()

    @nn.compact
    def __call__(self, wav):
        outs = []
        x = wav
        for s in range(self.cfg.n_scales):
            if s > 0:
                x = _avg_pool1d(x)
            outs.append(ScaleDiscriminator(
                self.cfg.msd_channels, self.cfg.msd_groups,
                self.cfg.msd_kernels, self.cfg.msd_strides,
                name=f"s{s}")(x))
        return outs


class HiFiGANDiscriminators(nn.Module):
    """MPD + MSD bundle; one apply returns all 8 sub-discriminator
    outputs so the whole D forward is a single XLA graph."""

    cfg: HiFiGANDiscConfig = HiFiGANDiscConfig()

    @nn.compact
    def __call__(self, wav):
        return (MultiPeriodDiscriminator(self.cfg, name="mpd")(wav)
                + MultiScaleDiscriminator(self.cfg, name="msd")(wav))


# ---------------------------------------------------------------------------
# HiFi-GAN training losses (paper section 2.4; LSGAN form)
# ---------------------------------------------------------------------------

def discriminator_loss(real_outs, fake_outs):
    """sum_k mean((1 - D_k(y))^2) + mean(D_k(y_hat)^2)."""
    loss = 0.0
    for (_, dr), (_, df) in zip(real_outs, fake_outs):
        loss = loss + ((1.0 - dr) ** 2).mean() + (df ** 2).mean()
    return loss


def generator_adv_loss(fake_outs):
    """sum_k mean((1 - D_k(y_hat))^2)."""
    loss = 0.0
    for _, df in fake_outs:
        loss = loss + ((1.0 - df) ** 2).mean()
    return loss


def feature_matching_loss(real_outs, fake_outs):
    """sum over discriminators and layers of mean |f_real - f_fake|
    (official repo scales the total by 2 at the call site; we fold the
    factor into ``lambda_fm`` in the trainer)."""
    loss = 0.0
    for (fr, _), (ff, _) in zip(real_outs, fake_outs):
        for r, f in zip(fr, ff):
            loss = loss + jnp.abs(r - f).mean()
    return loss

"""JCU (Joint Conditional/Unconditional) discriminator for the legacy
DiffGAN-TTS training path, TPU-first.

The reference snapshot configures this module (``config/*/model.yaml``
``discriminator:`` block) and drives it from the legacy eval path
(``evaluate.py:79-98``: ``discriminator(x_ts, x_t_prevs, spk_emb, t) ->
(cond_feats, uncond_feats)``) and from ``DiffGANTTSLoss.get_fm_loss``
(``model/loss.py:728-736``), but the module source itself is absent from
the snapshot — it comes from the DiffGAN-TTS upstream the reference was
built on.  This is a faithful re-creation of that architecture from the
config contract and call sites, the same way ``audio/stft.py`` supplies
the reference's missing ``audio`` package:

- shared trunk: ``n_layer`` strided 1-D convs over the concatenated
  ``[x_t_prev; x_t]`` mel pair (projected by a linear layer first);
- unconditional branch: ``n_uncond_layer`` further convs on the trunk
  output;
- conditional branch: ``n_cond_layer`` convs on the trunk output plus a
  diffusion-step embedding (and speaker embedding when multi-speaker)
  broadcast over time;
- every activation is leaky_relu(0.2); returned feature lists have the
  logits as their last element, matching ``get_fm_loss``'s use of
  ``feats[:-1]`` and the LSGAN loss's use of ``feats[-1]``.

TPU-first: channels-last layout throughout (strided convs lower to MXU
matmuls); feature lists are pytrees so the whole D step jits cleanly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cmtts_tpu.core.config import Config
from cmtts_tpu.models.denoiser import diffusion_embedding, mish

D_LRELU_SLOPE = 0.2


class JCUDiscriminator(nn.Module):
    """cfg.model.discriminator drives the layer plan; call returns
    ``(cond_feats, uncond_feats)`` — lists of (B, T', C) activations,
    last entry = logits."""

    cfg: Config

    @nn.compact
    def __call__(self, x_ts, x_t_prevs, spk_emb, t):
        """x_ts/x_t_prevs: (B, T, n_mels); spk_emb: (B, H) or None;
        t: (B,) integer diffusion step."""
        d = self.cfg.model.discriminator
        res_ch = self.cfg.model.denoiser.residual_channels

        x = jnp.concatenate([x_t_prevs, x_ts], axis=-1)
        x = nn.Dense(x.shape[-1], name="input_projection")(x)

        # diffusion-step conditioning (Mish MLP, as in the denoiser)
        step = diffusion_embedding(t.astype(jnp.float32), res_ch)
        step = nn.Dense(res_ch * 4, name="mlp_0")(step)
        step = mish(step)
        step = nn.Dense(d.n_channels[d.n_layer - 1], name="mlp_1")(step)

        cond_feats, uncond_feats = [], []
        for i in range(d.n_layer):
            x = nn.Conv(d.n_channels[i], (d.kernel_sizes[i],),
                        strides=(d.strides[i],), padding="SAME",
                        name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, D_LRELU_SLOPE)
            cond_feats.append(x)
            uncond_feats.append(x)

        x_cond = x + step[:, None, :]
        if self.cfg.model.multi_speaker and spk_emb is not None:
            s = nn.Dense(d.n_channels[d.n_layer - 1], name="spk_mlp")(spk_emb)
            x_cond = x_cond + s[:, None, :]
        x_uncond = x

        for i in range(d.n_layer, d.n_layer + d.n_uncond_layer):
            x_uncond = nn.Conv(d.n_channels[i], (d.kernel_sizes[i],),
                               strides=(d.strides[i],), padding="SAME",
                               name=f"uncond_conv_{i}")(x_uncond)
            x_uncond = nn.leaky_relu(x_uncond, D_LRELU_SLOPE)
            uncond_feats.append(x_uncond)

        for i in range(d.n_layer, d.n_layer + d.n_cond_layer):
            x_cond = nn.Conv(d.n_channels[i], (d.kernel_sizes[i],),
                             strides=(d.strides[i],), padding="SAME",
                             name=f"cond_conv_{i}")(x_cond)
            x_cond = nn.leaky_relu(x_cond, D_LRELU_SLOPE)
            cond_feats.append(x_cond)

        return cond_feats, uncond_feats

"""CMTTS: the full trained module (conditioning net + denoiser).

Functional re-design of the reference ``CMTotalTTS``
(``model/cm_tool/tts_net.py:40-183``) and ``DurationPitchSpeakerNet``
(``model/cmtts.py:10-122``).  Instead of stashing variance losses on
``self.losses``, ``__call__`` returns (net_out, cond_out) and the loss is
computed functionally in :mod:`cmtts_tpu.cm.losses`.

Methods:
  - ``condition``: text -> conditioning dict (one cond-net pass).
  - ``denoise``:   bare denoiser on precomputed conditioning (used by the
    fused inference pipeline — fixes the reference inefficiency of
    re-running the cond-net inside every sampler step, SURVEY §3.2).
  - ``__call__``:  cond-net + denoiser (training parity path).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cmtts_tpu.core.config import Config
from cmtts_tpu.core.masks import length_mask
from cmtts_tpu.models.denoiser import Denoiser
from cmtts_tpu.models.encoder import FFTEncoder
from cmtts_tpu.models.variance import VarianceAdaptor
from cmtts_tpu.text.symbols import VOCAB_SIZE


class CMTTS(nn.Module):
    cfg: Config

    def setup(self):
        mc = self.cfg.model
        self.encoder = FFTEncoder(
            mc.transformer, VOCAB_SIZE, mc.max_seq_len, name="encoder")
        self.variance_adaptor = VarianceAdaptor(
            mc.transformer, mc.variance_predictor, mc.variance_embedding,
            self.cfg.pitch, self.cfg.energy, name="variance_adaptor")
        if mc.multi_speaker:
            if mc.speaker_embedder == "none":
                self.speaker_emb = nn.Embed(
                    mc.n_speakers, mc.transformer.encoder_hidden, name="speaker_emb")
            else:
                self.speaker_proj = nn.Dense(
                    mc.transformer.encoder_hidden, name="speaker_proj")
        self.denoiser = Denoiser(
            mc.denoiser, self.cfg.stft.n_mel_channels, mc.multi_speaker,
            name="denoiser")

    def _speaker(self, speakers, spker_embeds):
        mc = self.cfg.model
        if not mc.multi_speaker:
            return None
        if mc.speaker_embedder == "none":
            return self.speaker_emb(speakers)
        return self.speaker_proj(spker_embeds)

    def condition(
        self,
        speakers,
        texts,                 # (B, T_txt) int32, 0-padded
        src_lens,              # (B,)
        t_mel: int,            # static mel bucket
        mel2ph=None,
        d_targets=None,
        p_targets=None,
        e_targets=None,
        spker_embeds=None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        deterministic: bool = True,
    ) -> dict:
        src_pad_mask = length_mask(src_lens, texts.shape[1])
        enc = self.encoder(texts, src_pad_mask, deterministic)
        spk = self._speaker(speakers, spker_embeds)
        out = self.variance_adaptor(
            enc, src_pad_mask, t_mel,
            mel2ph=mel2ph, d_targets=d_targets, p_targets=p_targets,
            e_targets=e_targets, speaker_emb=spk,
            p_control=p_control, e_control=e_control, d_control=d_control,
            deterministic=deterministic)
        out["speaker_emb"] = spk
        out["src_pad_mask"] = src_pad_mask
        return out

    def denoise(self, x_scaled, rescaled_t, cond, speaker_emb=None):
        """Bare denoiser: (B, L, n_mels) scaled input -> model output."""
        return self.denoiser(x_scaled, rescaled_t, cond, speaker_emb)

    def __call__(
        self,
        x_scaled,              # (B, L, n_mels): c_in * x_t
        rescaled_t,            # (B,)
        speakers=None,
        texts=None,
        src_lens=None,
        mel2ph=None,
        d_targets=None,
        p_targets=None,
        e_targets=None,
        spker_embeds=None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        deterministic: bool = True,
    ):
        cond_out = self.condition(
            speakers, texts, src_lens, x_scaled.shape[1],
            mel2ph=mel2ph, d_targets=d_targets, p_targets=p_targets,
            e_targets=e_targets, spker_embeds=spker_embeds,
            p_control=p_control, e_control=e_control, d_control=d_control,
            deterministic=deterministic)
        net_out = self.denoiser(
            x_scaled, rescaled_t, cond_out["cond"], cond_out["speaker_emb"])
        return net_out, cond_out

"""Variance adaptor: duration / pitch(CWT|frame|ph) / energy, TPU-first.

Re-design of the reference VarianceAdaptor (``model/modules.py:168-412``).
The critical change is the LengthRegulator: the reference expands phoneme
states with a per-sample Python loop (``modules.py:415-448``); here the
expansion is a static-shape gather ``x_mel = x_ph[mel2ph-1]`` with a zero
row for padding, and ``mel2ph`` itself is computed with vectorized
interval membership (same math as ``utils/tools.py:768-798``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cmtts_tpu.audio.pitch import (
    cwt2f0_norm_jnp,
    denorm_f0_jnp,
    f0_to_coarse_jnp,
)
from cmtts_tpu.core.config import (
    EnergyConfig,
    PitchConfig,
    TransformerConfig,
    VarianceEmbeddingConfig,
    VariancePredictorConfig,
)
from cmtts_tpu.models.encoder import PositionalEmbedding, positions_from_mask


def grad_scale(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Forward identity, backward scaled by ``scale`` (the reference's
    predictor_grad trick, modules.py:262,273,356)."""
    return jax.lax.stop_gradient(x) + scale * (x - jax.lax.stop_gradient(x))


def dur_to_mel2ph(dur: jnp.ndarray, pad_mask: jnp.ndarray, t_mel: int) -> jnp.ndarray:
    """Durations (B, T_txt) -> mel2ph (B, t_mel), 1-indexed, 0 = padding.

    Vectorized interval membership, identical math to the reference
    ``dur_to_mel2ph`` (utils/tools.py:768-798) but with a static output
    length ``t_mel`` (frames beyond sum(dur) get 0).
    """
    dur = jnp.round(dur.astype(jnp.float32)).astype(jnp.int32)
    dur = dur * (~pad_mask).astype(jnp.int32)
    cumsum = jnp.cumsum(dur, axis=1)  # (B, T)
    cumsum_prev = jnp.concatenate(
        [jnp.zeros_like(cumsum[:, :1]), cumsum[:, :-1]], axis=1
    )
    pos = jnp.arange(t_mel, dtype=jnp.int32)[None, None, :]  # (1,1,L)
    token_idx = jnp.arange(1, dur.shape[1] + 1, dtype=jnp.int32)[None, :, None]
    member = (pos >= cumsum_prev[:, :, None]) & (pos < cumsum[:, :, None])
    return (token_idx * member.astype(jnp.int32)).sum(axis=1)  # (B, L)


def gather_by_mel2ph(x_ph: jnp.ndarray, mel2ph: jnp.ndarray) -> jnp.ndarray:
    """Expand phoneme-level states to frames: x[b, t] = x_ph[b, mel2ph-1],
    zeros where mel2ph == 0 (the static-shape LengthRegulator)."""
    B, T, C = x_ph.shape
    padded = jnp.concatenate([jnp.zeros((B, 1, C), x_ph.dtype), x_ph], axis=1)
    # clip: out-of-bounds alignment indices must degrade to the last
    # phone, not NaN-fill (JAX gather FILL_OR_DROP would silently poison
    # training — the dataset validates alignment, this is the backstop)
    idx = jnp.clip(mel2ph[:, :, None], 0, padded.shape[1] - 1)
    return jnp.take_along_axis(padded, idx, axis=1)


class ConvPredictorStack(nn.Module):
    """Shared conv->ReLU->LayerNorm->dropout tower used by duration,
    pitch and energy predictors (reference DurationPredictor /
    PitchPredictor, modules.py:451-555)."""

    n_layers: int
    n_chans: int
    kernel_size: int
    dropout: float
    mask_between_layers: bool = False

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        nonpad = (~pad_mask).astype(x.dtype)[..., None]
        for i in range(self.n_layers):
            x = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME",
                        kernel_init=nn.initializers.he_normal(), name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-12, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            if self.mask_between_layers:
                x = x * nonpad
        return x


class DurationPredictor(nn.Module):
    """Log-duration predictor (reference modules.py:451-509)."""

    vp: VariancePredictorConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        h = ConvPredictorStack(
            self.vp.dur_predictor_layers, self.vp.filter_size,
            self.vp.dur_predictor_kernel, self.vp.dropout,
            mask_between_layers=True, name="stack",
        )(x, pad_mask, deterministic)
        out = nn.Dense(1, name="proj")(h)
        out = out * (~pad_mask).astype(out.dtype)[..., None]
        return out[..., 0]  # (B, T) log-durations


class VariancePredictor(nn.Module):
    """Pitch/energy predictor: its own positional embedding with learned
    alpha, conv stack, linear head (reference PitchPredictor,
    modules.py:512-555)."""

    vp: VariancePredictorConfig
    odim: int
    n_layers: int | None = None

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        # Exact reference semantics (PitchPredictor, modules.py:541-543):
        # fairseq make_positions on the FIRST FEATURE CHANNEL — a position
        # counts as padding iff x[..., 0] == 0 (true for zero-masked
        # encoder states; incidentally never true after a biased Linear or
        # a speaker-embedding add, matching the reference's behavior).
        nonpad = x[..., 0] != 0
        positions = positions_from_mask(nonpad)
        pos = PositionalEmbedding(x.shape[-1], 4096, learned_alpha=True, name="pos")(
            positions)
        x = x + pos
        h = ConvPredictorStack(
            self.n_layers or self.vp.predictor_layers, self.vp.filter_size,
            self.vp.predictor_kernel, self.vp.dropout, name="stack",
        )(x, pad_mask, deterministic)
        return nn.Dense(self.odim, name="proj")(h)  # (B, T, odim)


class VarianceAdaptor(nn.Module):
    """Speaker add -> duration -> (phoneme-level energy) -> length
    regulate -> pitch -> (frame-level energy).  Returns everything the CM
    loss and the denoiser conditioning need.

    Structure parity: reference VarianceAdaptor.forward
    (modules.py:331-412).
    """

    tc: TransformerConfig
    vp: VariancePredictorConfig
    ve: VarianceEmbeddingConfig
    pitch_cfg: PitchConfig
    energy_cfg: EnergyConfig

    def setup(self):
        self.duration_predictor = DurationPredictor(self.vp, name="duration_predictor")
        if self.ve.use_pitch_embed:
            if self.pitch_cfg.pitch_type == "cwt":
                cwt_out = 10 + (1 if self.pitch_cfg.use_uv else 0)
                self.cwt_in = nn.Dense(self.vp.cwt_hidden_size, name="cwt_in")
                self.cwt_predictor = VariancePredictor(self.vp, odim=cwt_out, name="cwt_predictor")
                self.cwt_stats = nn.Sequential([
                    nn.Dense(self.vp.cwt_hidden_size), jax.nn.relu,
                    nn.Dense(self.vp.cwt_hidden_size), jax.nn.relu,
                    nn.Dense(2),
                ])
            else:
                # "frame" predicts f0[,uv] per mel frame; "ph" predicts one
                # f0 per phoneme, gathered to frames via mel2ph
                odim = 2 if self.pitch_cfg.pitch_type == "frame" else 1
                self.pitch_predictor = VariancePredictor(self.vp, odim=odim, name="pitch_predictor")
            self.pitch_embed = nn.Embed(
                self.ve.pitch_n_bins, self.tc.encoder_hidden,
                embedding_init=_zero_row0_normal(self.tc.encoder_hidden),
                name="pitch_embed")
        if self.ve.use_energy_embed:
            self.energy_predictor = VariancePredictor(self.vp, odim=1, name="energy_predictor")
            if self.ve.energy_quantization == "log":
                bins = np.exp(np.linspace(
                    np.log(max(self.energy_cfg.energy_min, 1e-8)),
                    np.log(max(self.energy_cfg.energy_max, 1e-7)),
                    self.ve.energy_n_bins - 1))
            else:
                bins = np.linspace(self.energy_cfg.energy_min,
                                   self.energy_cfg.energy_max,
                                   self.ve.energy_n_bins - 1)
            self.energy_bins = jnp.asarray(bins, dtype=jnp.float32)
            self.energy_embed = nn.Embed(
                self.ve.energy_n_bins, self.tc.encoder_hidden,
                embedding_init=_zero_row0_normal(self.tc.encoder_hidden),
                name="energy_embed")

    # -- energy ------------------------------------------------------------
    def _energy(self, x, target, control, deterministic):
        """Predict energy; embed target (train) or prediction (infer).

        Note: the reference drops the predictor_grad blend for energy (the
        expression at modules.py:320 is computed but unused) — we keep its
        effective behavior: full gradient into the energy predictor input.
        """
        pad = jnp.zeros(x.shape[:2], dtype=bool)
        pred = self.energy_predictor(x, pad, deterministic)[..., 0]
        src = target if target is not None else pred * control
        idx = jnp.searchsorted(self.energy_bins, src, side="left").astype(jnp.int32)
        return pred, self.energy_embed(idx)

    # -- pitch -------------------------------------------------------------
    def _pitch_cwt(self, x_mel, encoder_out, mel2ph, p_targets, control,
                   deterministic):
        pc = self.pitch_cfg
        x_in = grad_scale(x_mel, self.vp.predictor_grad)
        pad = jnp.zeros(x_mel.shape[:2], dtype=bool)
        cwt_out = self.cwt_predictor(self.cwt_in(x_in), pad, deterministic) * control
        # NOTE: the reference feeds the raw first-phoneme state to the stats
        # head with no predictor_grad blend (modules.py:283)
        stats = self.cwt_stats(encoder_out[:, 0, :])
        f0_mean, f0_std = stats[:, 0], stats[:, 1]
        cwt_spec_pred = cwt_out[..., :10]

        # padding-invariant inverse-CWT standardization (opt-in fix over
        # the reference; see audio/pitch.inverse_cwt_jnp)
        cwt_mask = (mel2ph > 0) if pc.cwt_masked_std else None
        if p_targets is not None:
            f0 = cwt2f0_norm_jnp(
                p_targets["cwt_spec"], p_targets["f0_mean"], p_targets["f0_std"],
                mel2ph.shape[1], pc.pitch_norm, pc.f0_mean, pc.f0_std,
                pc.pitch_norm_eps, mask=cwt_mask)
            uv = p_targets["uv"]
        else:
            f0 = cwt2f0_norm_jnp(
                cwt_spec_pred, f0_mean, f0_std * self.vp.cwt_std_scale,
                mel2ph.shape[1], pc.pitch_norm, pc.f0_mean, pc.f0_std,
                pc.pitch_norm_eps, mask=cwt_mask)
            uv = (cwt_out[..., -1] > 0) if pc.use_uv else None

        f0_denorm = denorm_f0_jnp(f0, uv, pc.pitch_norm, pc.f0_mean, pc.f0_std,
                                  pc.use_uv)
        coarse = f0_to_coarse_jnp(f0_denorm)
        embed = self.pitch_embed(coarse)
        pred = {
            "pitch_pred": None,
            "f0_denorm": f0_denorm,
            "cwt": cwt_out,
            "f0_mean": f0_mean,
            "f0_std": f0_std,
        }
        return pred, embed

    def _pitch_ph(self, encoder_out, mel2ph, p_targets, control,
                  deterministic):
        """Phoneme-level pitch (reference get_pitch_embedding 'ph' branch,
        modules.py:261-274): predict per-phoneme f0 on the pre-LR states,
        bucketize, gather the COARSE ids through mel2ph."""
        pc = self.pitch_cfg
        x_in = grad_scale(encoder_out, self.vp.predictor_grad)
        pad = jnp.zeros(encoder_out.shape[:2], dtype=bool)
        pitch_pred = self.pitch_predictor(x_in, pad, deterministic) * control
        if p_targets is not None and p_targets.get("f0") is not None:
            f0 = p_targets["f0"]          # phoneme-level targets
        else:
            f0 = pitch_pred[..., 0]
        f0_denorm = denorm_f0_jnp(f0, None, pc.pitch_norm, pc.f0_mean,
                                  pc.f0_std, use_uv=False)
        coarse = f0_to_coarse_jnp(f0_denorm)             # (B, T_txt)
        B = coarse.shape[0]
        padded = jnp.concatenate(
            [jnp.zeros((B, 1), coarse.dtype), coarse], axis=1)
        coarse_mel = jnp.take_along_axis(padded, mel2ph, axis=1)  # (B, T_mel)
        embed = self.pitch_embed(coarse_mel)
        pred = {
            "pitch_pred": pitch_pred,
            "f0_denorm": f0_denorm,
            "cwt": None,
            "f0_mean": None,
            "f0_std": None,
        }
        return pred, embed

    def _pitch_frame(self, x_mel, mel2ph, p_targets, control, deterministic):
        pc = self.pitch_cfg
        x_in = grad_scale(x_mel, self.vp.predictor_grad)
        pad = jnp.zeros(x_mel.shape[:2], dtype=bool)
        pitch_pred = self.pitch_predictor(x_in, pad, deterministic) * control
        pitch_padding = mel2ph == 0
        if p_targets is not None:
            f0, uv = p_targets["f0"], p_targets["uv"]
        else:
            f0 = pitch_pred[..., 0]
            uv = (pitch_pred[..., 1] > 0) if pc.use_uv else None
        f0_denorm = denorm_f0_jnp(f0, uv, pc.pitch_norm, pc.f0_mean, pc.f0_std,
                                  pc.use_uv, pitch_padding=pitch_padding)
        coarse = f0_to_coarse_jnp(f0_denorm)
        embed = self.pitch_embed(coarse)
        pred = {
            "pitch_pred": pitch_pred,
            "f0_denorm": f0_denorm,
            "cwt": None,
            "f0_mean": None,
            "f0_std": None,
        }
        return pred, embed

    # -- main --------------------------------------------------------------
    def __call__(
        self,
        x,                      # (B, T_txt, H) encoder output
        src_pad_mask,           # (B, T_txt) True = padding
        t_mel: int,             # static mel bucket length
        mel2ph=None,            # (B, t_mel) from data (training)
        d_targets=None,         # (B, T_txt)
        p_targets=None,         # dict or None
        e_targets=None,         # (B, T_txt) phoneme-level energy
        speaker_emb=None,       # (B, H)
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        deterministic: bool = True,
    ):
        if speaker_emb is not None:
            x = x + speaker_emb[:, None, :]

        log_d_pred = self.duration_predictor(
            grad_scale(x, self.vp.predictor_grad), src_pad_mask, deterministic)

        e_pred = None
        if self.ve.use_energy_embed and self.energy_cfg.feature == "phoneme_level":
            e_pred, e_embed = self._energy(x, e_targets, e_control, deterministic)
            x = x + e_embed
        encoder_out = x  # post speaker+energy, pre length-regulation

        if d_targets is not None:
            d_rounded = d_targets
            if mel2ph is None:
                mel2ph = dur_to_mel2ph(d_targets, src_pad_mask, t_mel)
            mel_lens = jnp.minimum(
                (d_targets * (~src_pad_mask)).sum(-1).astype(jnp.int32), t_mel)
        else:
            d_rounded = jnp.clip(
                jnp.round(jnp.exp(log_d_pred) - 1.0) * d_control, min=0)
            mel2ph = dur_to_mel2ph(d_rounded, src_pad_mask, t_mel)
            mel_lens = jnp.minimum(
                jnp.round(d_rounded * (~src_pad_mask)).sum(-1).astype(jnp.int32), t_mel)

        x_mel = gather_by_mel2ph(x, mel2ph)
        mel_pad_mask = jnp.arange(t_mel)[None, :] >= mel_lens[:, None]

        p_pred = None
        if self.ve.use_pitch_embed:
            if self.pitch_cfg.pitch_type == "cwt":
                p_pred, p_embed = self._pitch_cwt(
                    x_mel, encoder_out, mel2ph, p_targets, p_control, deterministic)
            elif self.pitch_cfg.pitch_type == "ph":
                p_pred, p_embed = self._pitch_ph(
                    encoder_out, mel2ph, p_targets, p_control, deterministic)
            else:
                p_pred, p_embed = self._pitch_frame(
                    x_mel, mel2ph, p_targets, p_control, deterministic)
            x_mel = x_mel + p_embed

        if self.ve.use_energy_embed and self.energy_cfg.feature == "frame_level":
            e_pred, e_embed = self._energy(x_mel, e_targets, e_control, deterministic)
            x_mel = x_mel + e_embed

        return {
            "cond": x_mel,                  # (B, t_mel, H)
            "log_d_pred": log_d_pred,       # (B, T_txt)
            "d_rounded": d_rounded,
            "p_pred": p_pred,
            "e_pred": e_pred,
            "mel2ph": mel2ph,
            "mel_lens": mel_lens,
            "mel_pad_mask": mel_pad_mask,
        }


def _zero_row0_normal(dim: int):
    """Embedding init: N(0, dim^-0.5) with row 0 zeroed (padding_idx=0
    semantics of the reference Embedding, model/blocks.py:10-15)."""
    def init(key, shape, dtype=jnp.float32):
        table = jax.random.normal(key, shape, dtype) * (dim ** -0.5)
        return table.at[0].set(0.0)
    return init

"""Mel-spectrogram front-end (the reference's missing ``audio`` package).

Reimplements the standard FastSpeech2 ``TacotronSTFT`` contract used by
the reference preprocessor (``preprocessor/preprocessor.py:15,44-52,292``):

    get_mel_from_wav(wav, stft) -> (mel [n_mels, T], energy [T])

with filter_length=1024, hop=256, win=1024, n_mels=80, sr=22050,
fmin=0, fmax=8000; mel = ln(clamp(mel_basis @ |STFT|, 1e-5)); energy =
L2 norm of each linear-magnitude frame.  The mel basis is the
librosa/Slaney filterbank (implemented natively — librosa is not
available here).

Everything is expressed over jax.numpy so the same code runs jitted on
TPU (batched, inside the metric/eval graphs) or on host via numpy inputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel_slaney(f: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3)
    logstep = np.log(6.4) / 27.0
    mel = f / (200.0 / 3)
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(mel: np.ndarray) -> np.ndarray:
    mel = np.asarray(mel, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3)
    logstep = np.log(6.4) / 27.0
    f = (200.0 / 3) * mel
    above = mel >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (mel - min_log_mel)), f)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1+n_fft//2).

    Matches librosa.filters.mel(htk=False, norm='slaney'), which is what
    the upstream FastSpeech2 ``audio`` package uses.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: each filter integrates to ~2/bandwidth.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


class MelSpectrogram:
    """Stateless mel front-end; precomputes window and mel basis on host."""

    def __init__(
        self,
        sampling_rate: int = 22050,
        filter_length: int = 1024,
        hop_length: int = 256,
        win_length: int = 1024,
        n_mel_channels: int = 80,
        mel_fmin: float = 0.0,
        mel_fmax: float | None = 8000.0,
    ):
        self.sampling_rate = sampling_rate
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        # periodic Hann (torch.hann_window default)
        n = np.arange(win_length)
        window = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
        if win_length < filter_length:
            pad = (filter_length - win_length) // 2
            window = np.pad(window, (pad, filter_length - win_length - pad))
        self.window = window.astype(np.float32)
        self.mel_basis = mel_filterbank(
            sampling_rate, filter_length, n_mel_channels, mel_fmin, mel_fmax
        )

    def _frames(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Center reflect-pad then frame: (T,) -> (n_frames, filter_length)."""
        pad = self.filter_length // 2
        wav = jnp.pad(wav, (pad, pad), mode="reflect")
        n_frames = 1 + (wav.shape[0] - self.filter_length) // self.hop_length
        idx = (
            jnp.arange(n_frames)[:, None] * self.hop_length
            + jnp.arange(self.filter_length)[None, :]
        )
        return wav[idx]

    @partial(jax.jit, static_argnums=0)
    def linear_magnitude(self, wav: jnp.ndarray) -> jnp.ndarray:
        """|STFT| of a mono waveform, shape (1+n_fft//2, T_frames)."""
        frames = self._frames(wav) * self.window[None, :]
        spec = jnp.fft.rfft(frames, n=self.filter_length, axis=-1)
        return jnp.abs(spec).T.astype(jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def mel_and_energy(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(mel [n_mels, T], energy [T]) with log dynamic-range compression."""
        mag = self.linear_magnitude(wav)
        mel = jnp.log(jnp.clip(self.mel_basis @ mag, min=1e-5))
        energy = jnp.linalg.norm(mag, axis=0)
        return mel, energy

    def __call__(self, wav) -> tuple[np.ndarray, np.ndarray]:
        """Host-friendly entry: numpy in, numpy out (mel [n_mels,T], energy [T])."""
        mel, energy = self.mel_and_energy(jnp.asarray(wav, dtype=jnp.float32))
        return np.asarray(mel), np.asarray(energy)


def get_mel_from_wav(audio, stft: MelSpectrogram):
    """Drop-in for the reference's ``Audio.tools.get_mel_from_wav``."""
    return stft(audio)


class GriffinLim:
    """Mel -> waveform inversion (Griffin-Lim phase recovery, jitted).

    The reference vocodes with HiFi-GAN checkpoints that are missing
    blobs in this environment (``.MISSING_LARGE_BLOBS:3-5``); this
    asset-free inverter closes the quality loop: log-mel -> linear
    magnitude via the mel-basis pseudo-inverse -> N Griffin-Lim
    iterations with the same centered-Hann STFT the front-end uses.
    Quality is bounded by phase recovery (no neural vocoder sheen) but
    is speech-intelligible — sufficient for MCD/FFE/F0 metric gating.
    """

    def __init__(self, stft: MelSpectrogram, n_iters: int = 60):
        self.stft = stft
        self.n_iters = n_iters
        # regularized pseudo-inverse of the mel basis (513 x 80)
        mb = stft.mel_basis.astype(np.float64)
        self.inv_basis = np.linalg.pinv(mb, rcond=1e-8).astype(np.float32)

    def _ola(self, frames: jnp.ndarray, n: int, idx: jnp.ndarray):
        """Windowed overlap-add with squared-window normalization."""
        w = jnp.asarray(self.stft.window)
        out = jnp.zeros(n).at[idx].add(frames * w[None, :])
        wsum = jnp.zeros(n).at[idx].add(
            jnp.broadcast_to(w * w, frames.shape))
        return out / jnp.maximum(wsum, 1e-8)

    @partial(jax.jit, static_argnums=(0, 2))
    def _gl(self, mag: jnp.ndarray, n_frames: int) -> jnp.ndarray:
        """mag: (F, T) target linear magnitudes -> waveform (padded)."""
        nfft = self.stft.filter_length
        hop = self.stft.hop_length
        n = (n_frames - 1) * hop + nfft
        idx = (jnp.arange(n_frames)[:, None] * hop
               + jnp.arange(nfft)[None, :])
        w = jnp.asarray(self.stft.window)

        def wav_of(spec):
            frames = jnp.fft.irfft(spec.T, n=nfft)
            return self._ola(frames, n, idx)

        def spec_of(wav):
            frames = wav[idx] * w[None, :]
            return jnp.fft.rfft(frames, n=nfft, axis=-1).T

        spec = mag.astype(jnp.complex64)  # zero phase init

        def body(_, spec):
            s = spec_of(wav_of(spec))
            phase = s / jnp.maximum(jnp.abs(s), 1e-8)
            return mag * phase

        spec = jax.lax.fori_loop(0, self.n_iters, body, spec)
        return wav_of(spec)

    def __call__(self, log_mel: np.ndarray) -> np.ndarray:
        """log_mel (T, n_mels) [the stored feature layout] -> wav np."""
        m = np.exp(np.asarray(log_mel, np.float32)).T  # (n_mels, T)
        mag = np.maximum(self.inv_basis @ m, 0.0)
        n_frames = mag.shape[1]
        wav = np.asarray(self._gl(jnp.asarray(mag), n_frames))
        pad = self.stft.filter_length // 2
        wav = wav[pad: pad + n_frames * self.stft.hop_length]
        peak = np.abs(wav).max()
        if peak > 1.0:
            wav = wav / peak * 0.95
        return wav.astype(np.float32)


def stft_magnitudes(wav: np.ndarray, n_fft: int, win_length: int,
                    hop_length: int, center: bool = True) -> np.ndarray:
    """Generic |STFT| on host numpy, frames-major: (T_frames, 1+n_fft//2).

    Periodic Hann window of ``win_length`` zero-padded to ``n_fft``
    (librosa/torch semantics) — used by the speaker-embedder front-ends.
    """
    wav = np.asarray(wav, np.float32)
    n = np.arange(win_length)
    window = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        wav = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = max(1, 1 + (len(wav) - n_fft) // hop_length)
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(n_fft)[None, :])
    frames = wav[np.minimum(idx, len(wav) - 1)] * window[None, :]
    return np.abs(np.fft.rfft(frames, n=n_fft, axis=-1)).astype(np.float32)

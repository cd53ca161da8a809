"""Feature extractors for the metric suite.

librosa is absent; MFCC follows librosa.feature.mfcc semantics
(power mel spectrogram, n_mels=128, power_to_db, DCT-II ortho, 20
coeffs).  "mcep" is the documented substitution for the reference's
WORLD+pysptk mel-cepstrum (all_metrics.py:69-81): DCT of the log mel
spectrum at 5 ms hop — same cepstral-distance structure, different
basis, so absolute MCD values shift slightly but track the same
differences.
"""

from __future__ import annotations

import numpy as np
from scipy.fftpack import dct

from cmtts_tpu.audio.stft import mel_filterbank, stft_magnitudes
from cmtts_tpu.audio.wavio import read_wav

SR = 22050


def load_wav(path: str, sr: int = SR) -> np.ndarray:
    wav, wav_sr = read_wav(path)
    if wav_sr != sr:
        # linear resample (librosa.load(sr=...) equivalent for eval use)
        n_out = int(round(len(wav) * sr / wav_sr))
        x_old = np.linspace(0.0, 1.0, num=len(wav), endpoint=False)
        x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
        wav = np.interp(x_new, x_old, wav).astype(np.float32)
    return wav.astype(np.float32)


def mel_power(wav: np.ndarray, sr: int = SR, n_fft: int = 2048,
              hop: int = 512, n_mels: int = 128) -> np.ndarray:
    """librosa.feature.melspectrogram equivalent -> (n_mels, T)."""
    mag = stft_magnitudes(wav, n_fft=n_fft, win_length=n_fft, hop_length=hop)
    basis = mel_filterbank(sr, n_fft, n_mels, fmin=0.0, fmax=sr / 2)
    return (basis @ (mag ** 2).T).astype(np.float32)


def power_to_db(S: np.ndarray, top_db: float = 80.0) -> np.ndarray:
    ref = np.maximum(S.max(), 1e-10)
    log_spec = 10.0 * np.log10(np.maximum(S, 1e-10))
    log_spec -= 10.0 * np.log10(ref)
    return np.maximum(log_spec, -top_db)


def mfcc(wav: np.ndarray, sr: int = SR, n_mfcc: int = 20) -> np.ndarray:
    """librosa.feature.mfcc equivalent -> (n_mfcc, T)."""
    S_db = power_to_db(mel_power(wav, sr))
    return dct(S_db, axis=0, type=2, norm="ortho")[:n_mfcc].astype(np.float32)


def mcep(wav: np.ndarray, sr: int = SR, order: int = 24,
         frame_period_ms: float = 5.0, n_fft: int = 512) -> np.ndarray:
    """Mel-cepstrum substitute, frames-major (T, order+1).

    Reference: pysptk.mcep(order=24, alpha=0.435) on the WORLD spectral
    envelope at 5 ms frames (all_metrics.py:389-418).  Here: DCT-II of
    the log mel spectrum (80 mels) of the |STFT| at the same frame rate.
    """
    hop = int(sr * frame_period_ms / 1000)
    mag = stft_magnitudes(wav, n_fft=n_fft, win_length=n_fft, hop_length=hop)
    basis = mel_filterbank(sr, n_fft, 80, fmin=0.0, fmax=sr / 2)
    power = (mag ** 2) @ basis.T
    # floor at -80 dB below the utterance max: a WORLD spectral envelope
    # (the reference's mcep input) never reaches digital zero, so an
    # absolute floor would let silent bands dominate the cepstral distance
    floor = max(float(power.max()), 1e-10) * 1e-8
    logmel = np.log(np.maximum(power, floor))
    c = dct(logmel, axis=1, type=2, norm="ortho")[:, : order + 1]
    return c.astype(np.float64)


def mfcc_normalized(path: str, sr: int = SR) -> np.ndarray:
    """Reference ``__get_mfcc`` (all_metrics.py:104-108): MFCC.T
    column-normalized -> (T, 20)."""
    m = mfcc(load_wav(path, sr), sr).T
    return m / (np.linalg.norm(m, axis=0, keepdims=True) + 1e-12)


def trim_silence(wav: np.ndarray, top_db: float = 23.0,
                 frame_length: int = 1024, hop_length: int = 256) -> np.ndarray:
    """librosa.effects.trim equivalent (used by compute_ffe,
    all_metrics.py:534-546)."""
    n = max(1, 1 + (len(wav) - frame_length) // hop_length)
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = wav[np.minimum(idx, len(wav) - 1)]
    rms = np.sqrt((frames ** 2).mean(axis=1)) + 1e-12
    db = 20 * np.log10(rms / (rms.max() + 1e-12))
    voiced = np.where(db > -top_db)[0]
    if len(voiced) == 0:
        return wav
    start = voiced[0] * hop_length
    end = min(len(wav), (voiced[-1] + 1) * hop_length + frame_length)
    return wav[start:end]

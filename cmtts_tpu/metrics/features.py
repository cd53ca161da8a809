"""Feature extractors for the metric suite.

librosa is absent; MFCC follows librosa.feature.mfcc semantics
(power mel spectrogram, n_mels=128, power_to_db, DCT-II ortho, 20
coeffs).

"mcep" is TRUE mel-cepstrum, matching the reference pipeline
(all_metrics.py:69-81): a spectral envelope at 5 ms frames passed
through the SPTK ``mcep(order=24, alpha=0.435, maxiter=0, etype=1,
eps=1e-8, itype=3)`` initial estimate — exactly the real cepstrum of
the log periodogram followed by the ``freqt`` all-pass frequency warp
(pysptk with maxiter=0 runs zero Newton iterations, so the initial
estimate IS the output).  The envelope is a CheapTrick-style
f0-adaptive reimplementation (Morise 2015: 3/f0 Hann windowing, DC
correction, 2f0/3 rectangular smoothing, liftering recovery with
q1=-0.15) over YIN f0 — pyworld/pysptk are unavailable in this
environment, so the envelope is algorithm-faithful rather than
bit-identical (DIO/StoneMask f0 replaced by YIN).  The previous
DCT-of-log-mel variant is kept as ``mcep_dctmel`` / metric
``mcd_dctmel``.
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


def mcep_dctmel(wav: np.ndarray, sr: int = SR, order: int = 24,
                frame_period_ms: float = 5.0, n_fft: int = 512) -> np.ndarray:
    """DCT-of-log-mel cepstrum substitute, frames-major (T, order+1).

    Kept as an internal regression metric (``mcd_dctmel``); NOT
    comparable to the paper's MCD table — use :func:`mcep` for that.
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


# -- true mel-cepstrum (SPTK mcep semantics) ---------------------------------

def freqt(c: np.ndarray, order: int, alpha: float) -> np.ndarray:
    """SPTK ``freqt`` all-pass frequency transform, vectorized over
    frames: cepstrum (T, m1+1) -> warped cepstrum (T, order+1).

    Exact port of the published recursion (SPTK freqt.c; Oppenheim-
    Johnson warping): iterating i = m1..0 with
        g[0] = c[i] + a*d[0];  g[1] = b*d[0] + a*d[1];
        g[j] = d[j-1] + a*(d[j] - g[j-1])
    where d is the previous g and b = 1 - a^2.
    """
    c = np.atleast_2d(np.asarray(c, np.float64))
    T, m1p1 = c.shape
    b = 1.0 - alpha * alpha
    g = np.zeros((T, order + 1))
    for i in range(m1p1 - 1, -1, -1):
        d = g.copy()
        g[:, 0] = c[:, i] + alpha * d[:, 0]
        if order >= 1:
            g[:, 1] = b * d[:, 0] + alpha * d[:, 1]
        for j in range(2, order + 1):
            g[:, j] = d[:, j - 1] + alpha * (d[:, j] - g[:, j - 1])
    return g


def sptk_mcep_from_spectrum(sp: np.ndarray, order: int = 24,
                            alpha: float = 0.435, eps: float = 1e-8,
                            itype: int = 3) -> np.ndarray:
    """SPTK ``mcep(maxiter=0, etype=1, eps, itype=3)`` — the exact call
    the reference makes on the WORLD envelope (all_metrics.py:76-81).

    With ``maxiter=0`` the Newton loop never runs, so the result is the
    initial estimate: periodogram = sp^2 + eps (itype=3: amplitude
    input), real cepstrum of its log, endpoint halving, ``freqt`` warp.

    ``sp`` is frames-major (T, n_fft//2 + 1); returns (T, order+1).
    """
    sp = np.asarray(sp, np.float64)
    if itype == 3:
        periodogram = sp * sp + eps
    elif itype == 4:
        periodogram = sp + eps
    else:
        raise NotImplementedError(f"itype {itype}")
    n_half = sp.shape[1] - 1
    n_fft = 2 * n_half
    logp = np.log(periodogram)
    # real cepstrum of the even-symmetric log spectrum
    cep = np.fft.irfft(logp, n=n_fft, axis=1)[:, : n_half + 1]
    cep[:, 0] /= 2.0
    cep[:, n_half] /= 2.0
    return freqt(cep, order, alpha)


def _yin_f0_5ms(wav: np.ndarray, sr: int, frame_period_ms: float,
                n_frames: int) -> np.ndarray:
    """YIN f0 resampled onto the envelope frame grid (the reference's
    DIO/StoneMask f0 is pyworld-internal; YIN is this repo's tracker)."""
    from cmtts_tpu.metrics.yin import compute_yin

    pitches, _, _, times = compute_yin(wav, sr)
    if len(pitches) == 0:
        return np.zeros(n_frames)
    grid = np.arange(n_frames) * frame_period_ms / 1000.0
    idx = np.clip(np.searchsorted(times, grid), 0, len(pitches) - 1)
    return pitches[idx]


def cheaptrick_envelope(wav: np.ndarray, sr: int = SR, n_fft: int = 512,
                        frame_period_ms: float = 5.0,
                        f0: np.ndarray | None = None) -> np.ndarray:
    """CheapTrick-style spectral envelope (Morise 2015; pyworld
    wav2world's ``sp``), frames-major (T, n_fft//2+1).

    Steps per frame (f0-adaptive): 3/f0-long Hann window with DC
    removal, power spectrum with low-frequency DC correction below f0,
    rectangular smoothing of width 2f0/3, then log-domain liftering
    recovery with q1 = -0.15.  Unvoiced frames use the WORLD default
    f0 = 500 Hz; f0 below the fft-size floor 3*sr/(n_fft-3) likewise.
    """
    wav = np.asarray(wav, np.float64)
    hop_s = frame_period_ms / 1000.0
    n_frames = max(1, int(len(wav) / sr / hop_s) + 1)
    if f0 is None:
        f0 = _yin_f0_5ms(wav, sr, frame_period_ms, n_frames)
    f0 = np.asarray(f0, np.float64)[:n_frames]
    if len(f0) < n_frames:
        f0 = np.pad(f0, (0, n_frames - len(f0)))
    f0_floor = 3.0 * sr / (n_fft - 3.0)
    f0 = np.where(f0 < f0_floor, 500.0, f0)

    n_half = n_fft // 2
    freq_axis = np.arange(n_half + 1) * sr / n_fft
    quefrency = np.arange(n_fft) / sr
    out = np.empty((n_frames, n_half + 1))
    for t in range(n_frames):
        cf0 = f0[t]
        center = int(round(t * hop_s * sr))
        half_len = int(round(1.5 * sr / cf0))
        base = np.arange(-half_len, half_len + 1)
        idx = np.clip(center + base, 0, len(wav) - 1)
        window = 0.5 * np.cos(np.pi * (base / sr) * cf0 / 1.5) + 0.5
        seg = wav[idx] * window
        # DC removal (GetWindowedWaveform)
        seg -= window * (seg.sum() / max(window.sum(), 1e-12))
        if len(seg) > n_fft:  # very low f0 vs small fft: center-crop
            s = (len(seg) - n_fft) // 2
            seg = seg[s: s + n_fft]
        power = np.abs(np.fft.rfft(seg, n=n_fft)) ** 2

        # DC correction: mirror energy below f0 (DCCorrection)
        upper = int(cf0 * n_fft / sr) + 1
        if upper > 1:
            mirror = np.interp(cf0 - freq_axis[:upper], freq_axis, power)
            power[:upper] += mirror
        # linear smoothing with a rectangle of width 2*f0/3
        width_bins = cf0 * 2.0 / 3.0 * n_fft / sr
        power = _linear_smoothing(power, width_bins)
        power = np.maximum(power, 1e-12)

        # liftering recovery (SmoothingWithRecovery, q1 = -0.15)
        q1 = -0.15
        log_p = np.log(power)
        cep = np.fft.irfft(log_p, n=n_fft)
        smoothing_lifter = np.ones(n_fft)
        nz = quefrency[1:] * cf0 * np.pi
        smoothing_lifter[1:] = np.sin(nz) / nz
        compensation_lifter = (1.0 - 2.0 * q1) + 2.0 * q1 * np.cos(
            2.0 * np.pi * quefrency * cf0)
        cep *= smoothing_lifter * compensation_lifter
        out[t] = np.exp(np.fft.rfft(cep, n=n_fft).real[: n_half + 1])
    return out


def _linear_smoothing(power: np.ndarray, width_bins: float) -> np.ndarray:
    """Rectangular smoothing of a one-sided power spectrum with mirrored
    boundaries (WORLD LinearSmoothing)."""
    if width_bins <= 0:
        return power
    n = len(power)
    half = width_bins / 2.0
    pad = int(np.ceil(half)) + 2
    ext = np.pad(power, (pad, pad), mode="reflect")
    cum = np.concatenate([[0.0], np.cumsum(ext)])

    def integral(pos):  # pos in bins, relative to bin 0 of `power`
        x = np.clip(pos + pad, 0.0, len(ext) - 1e-9)
        i = np.floor(x).astype(int)
        frac = x - i
        return cum[i] + ext[i] * frac

    pos = np.arange(n, dtype=np.float64)
    return (integral(pos + half) - integral(pos - half)) / width_bins


def mcep(wav: np.ndarray, sr: int = SR, order: int = 24,
         frame_period_ms: float = 5.0, n_fft: int = 512,
         alpha: float = 0.435) -> np.ndarray:
    """True mel-cepstrum, frames-major (T, order+1): CheapTrick-style
    envelope -> SPTK mcep(order=24, alpha=0.435, maxiter=0) — the
    reference's ``__get_mgc`` pipeline (all_metrics.py:69-81)."""
    sp = cheaptrick_envelope(wav, sr, n_fft=n_fft,
                             frame_period_ms=frame_period_ms)
    return sptk_mcep_from_spectrum(sp, order=order, alpha=alpha)


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

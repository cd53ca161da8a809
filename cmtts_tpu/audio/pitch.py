"""Pitch math: in-graph jnp twins + host-side extraction utilities.

The reference splits pitch tooling between preprocessing (parselmouth
f0, pycwt CWT — host-side numpy, ``utils/pitch_tools.py:81-241``) and
the model graph (f0 bucketing, f0 de/normalization, inverse CWT,
``utils/pitch_tools.py:26-78, 244-279``).  We mirror that split: the
``*_jnp`` functions run under jit inside the variance adaptor; the numpy
ones run in the data pipeline.

Neither parselmouth nor pycwt exists in this environment, so both the f0
tracker (autocorrelation, Praat-style ``to_pitch_ac`` parameters) and
the Mexican-hat CWT are implemented natively.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# f0 coarse-bucketing constants (reference utils/pitch_tools.py:19-23)
F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
F0_MEL_MIN = 1127.0 * np.log(1.0 + F0_MIN / 700.0)
F0_MEL_MAX = 1127.0 * np.log(1.0 + F0_MAX / 700.0)


# ---------------------------------------------------------------------------
# In-graph (jax.numpy)
# ---------------------------------------------------------------------------

def f0_to_coarse_jnp(f0: jnp.ndarray) -> jnp.ndarray:
    """Bucketize f0 (Hz) into [1, 255] mel-spaced bins; 0 Hz maps to bin 1.

    Parity: reference ``f0_to_coarse`` (utils/pitch_tools.py:26-35).
    """
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1.0
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1.0, F0_BIN - 1)
    # torch path rounds via (x + 0.5).long() == floor(x + 0.5)
    return jnp.floor(f0_mel + 0.5).astype(jnp.int32)


def norm_f0_jnp(f0, uv, pitch_norm: str, f0_mean: float, f0_std: float, eps: float, use_uv: bool):
    """Normalize f0 ('standard' or 'log'); zero unvoiced if use_uv."""
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        f0 = jnp.log2(f0 + eps)
    if uv is not None and use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    return f0


def denorm_f0_jnp(
    f0, uv, pitch_norm: str, f0_mean: float, f0_std: float, use_uv: bool,
    pitch_padding=None,
):
    """Inverse of norm_f0 (reference utils/pitch_tools.py:64-78)."""
    if pitch_norm == "standard":
        f0 = f0 * f0_std + f0_mean
    elif pitch_norm == "log":
        f0 = 2.0 ** f0
    if uv is not None and use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = jnp.where(pitch_padding, 0.0, f0)
    return f0


def inverse_cwt_jnp(cwt_spec: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Reconstruct normalized log-f0 from a 10-scale CWT spectrogram.

    cwt_spec: (B, T, n_scales).  Parity: reference ``inverse_cwt_torch``
    (utils/pitch_tools.py:244-250) — weighted sum over scales with
    (i+3.5)^(-2.5) weights, then per-sequence standardization over T.

    ``mask=None`` reproduces the reference exactly: the standardization
    includes PADDING frames.  That is harmless when batches pad only a
    few frames (the reference's sorted training batches) but severely
    distorts the reconstruction under large static padding — at this
    framework's pow2 synthesis buckets the zero padding dilutes the
    mean/std and the voiced-frame recon RMSE grows from ~116 cents
    (unpadded) to ~353 cents at a 768-frame bucket (measured on the
    round-4 quality corpus).  Passing ``mask`` (B, T; True = valid)
    standardizes over valid frames only, making the reconstruction
    padding-invariant — a deliberate fix over the reference, off by
    default (PitchConfig.cwt_masked_std).
    """
    n_scales = cwt_spec.shape[-1]
    b = (jnp.arange(n_scales, dtype=cwt_spec.dtype) + 1.0 + 2.5) ** (-2.5)
    rec = (cwt_spec * b[None, None, :]).sum(-1)
    if mask is None:
        mean = rec.mean(-1, keepdims=True)
        # torch .std() uses Bessel's correction (unbiased, N-1)
        n = rec.shape[-1]
        var = ((rec - mean) ** 2).sum(-1, keepdims=True) / max(n - 1, 1)
        return (rec - mean) / jnp.sqrt(var)
    m = mask.astype(rec.dtype)
    n = jnp.maximum(m.sum(-1, keepdims=True), 2.0)
    mean = (rec * m).sum(-1, keepdims=True) / n
    var = (((rec - mean) ** 2) * m).sum(-1, keepdims=True) / (n - 1.0)
    return (rec - mean) / jnp.sqrt(var + 1e-12)


def cwt2f0_jnp(cwt_spec, mean, std, mask=None):
    """CWT spec (B,T,10) + per-utterance stats -> f0 in Hz (B,T).

    Parity: reference ``cwt2f0`` (utils/pitch_tools.py:261-272).
    """
    f0 = inverse_cwt_jnp(cwt_spec, mask)
    f0 = f0 * std[:, None] + mean[:, None]
    return jnp.exp(f0)


def cwt2f0_norm_jnp(
    cwt_spec, mean, std, t_mel: int,
    pitch_norm: str, f0_mean: float, f0_std: float, eps: float,
    mask=None,
):
    """cwt2f0 then re-normalize and pad/repeat to the mel length.

    Parity: reference ``cwt2f0_norm`` (utils/pitch_tools.py:274-279) —
    extends by repeating the last frame up to ``mel2ph``'s length.
    ``mask`` (aligned with ``cwt_spec``) opts into padding-invariant
    standardization; see :func:`inverse_cwt_jnp`.
    """
    f0 = cwt2f0_jnp(cwt_spec, mean, std, mask)
    t = f0.shape[1]
    if t < t_mel:
        f0 = jnp.concatenate([f0, jnp.repeat(f0[:, -1:], t_mel - t, axis=1)], axis=1)
    elif t > t_mel:
        f0 = f0[:, :t_mel]
    return norm_f0_jnp(f0, None, pitch_norm, f0_mean, f0_std, eps, use_uv=False)


# ---------------------------------------------------------------------------
# Host-side (numpy) — data pipeline
# ---------------------------------------------------------------------------

def f0_to_coarse_np(f0: np.ndarray) -> np.ndarray:
    f0_mel = 1127.0 * np.log(1.0 + f0 / 700.0)
    pos = f0_mel > 0
    f0_mel[pos] = (f0_mel[pos] - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1
    f0_mel[f0_mel <= 1] = 1
    f0_mel[f0_mel > F0_BIN - 1] = F0_BIN - 1
    coarse = np.rint(f0_mel).astype(np.int64)
    assert coarse.max() <= 255 and coarse.min() >= 1, (coarse.max(), coarse.min())
    return coarse


def norm_f0_np(f0, uv, pitch_norm, f0_mean, f0_std, eps, use_uv):
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        f0 = np.log2(f0 + eps)
    if uv is not None and use_uv:
        f0[uv > 0] = 0
    return f0


def norm_interp_f0(f0: np.ndarray, pitch_cfg) -> tuple[np.ndarray, np.ndarray]:
    """Normalize then linearly interpolate through unvoiced gaps.

    Parity: reference ``norm_interp_f0`` (utils/pitch_tools.py:50-61).
    ``pitch_cfg`` is a :class:`cmtts_tpu.core.config.PitchConfig`.
    """
    f0 = f0.astype(np.float64).copy()
    uv = (f0 == 0).astype(np.float32)
    f0 = norm_f0_np(
        f0, uv, pitch_cfg.pitch_norm, pitch_cfg.f0_mean, pitch_cfg.f0_std,
        pitch_cfg.pitch_norm_eps, pitch_cfg.use_uv,
    )
    n_uv = int(uv.sum())
    if n_uv == len(f0):
        f0[:] = 0
    elif n_uv > 0:
        voiced = np.where(uv == 0)[0]
        f0[uv > 0] = np.interp(np.where(uv > 0)[0], voiced, f0[voiced])
    return f0.astype(np.float32), uv


def convert_continuous_f0(f0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uv flags + gap-interpolated continuous f0 (reference :138-169)."""
    f0 = np.copy(f0).astype(np.float64)
    uv = np.float32(f0 != 0)
    if (f0 == 0).all():
        return uv, f0
    nz = np.where(f0 != 0)[0]
    f0[: nz[0]] = f0[nz[0]]
    f0[nz[-1]:] = f0[nz[-1]]
    nz = np.where(f0 != 0)[0]
    cont = np.interp(np.arange(len(f0)), nz, f0[nz])
    return uv, cont


def get_cont_lf0(f0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    uv, cont = convert_continuous_f0(f0)
    return uv, np.log(cont)


# -- Mexican-hat CWT (pycwt-compatible) -------------------------------------

_MEXHAT_FOURIER_FACTOR = 2.0 * np.pi / np.sqrt(2.5)  # m=2 DOG wavelet


def cwt_mexican_hat(signal: np.ndarray, dt: float = 0.005, dj: float = 1.0,
                    s0: float = 0.01, J: int = 9) -> tuple[np.ndarray, np.ndarray]:
    """Continuous wavelet transform with the Mexican-hat (DOG m=2) mother.

    FFT-based implementation matching pycwt's conventions, so outputs are
    interchangeable with the reference's ``get_lf0_cwt``
    (utils/pitch_tools.py:179-195: dt=0.005, dj=1, s0=2*dt, J=9 → 10
    scales).  Returns (W real part, (J+1, N) transposed to (N, J+1)
    by the caller) and the scale array s0 * 2^(j*dj).
    """
    x = np.asarray(signal, dtype=np.float64)
    n = len(x)
    # zero-pad to next power of two (pycwt default)
    n_fft = int(2 ** np.ceil(np.log2(n)))
    x_hat = np.fft.fft(x - x.mean(), n=n_fft)
    omega = 2.0 * np.pi * np.fft.fftfreq(n_fft, d=dt)
    scales = s0 * 2.0 ** (dj * np.arange(J + 1))
    W = np.empty((J + 1, n), dtype=np.complex128)
    m = 2
    from math import gamma as _gamma

    # DOG(m=2) in Fourier space: -(i^m)/sqrt(gamma(m+1/2)) * (s w)^m exp(-(s w)^2/2)
    norm_const = -((1j) ** m) / np.sqrt(_gamma(m + 0.5))
    for j, s in enumerate(scales):
        sw = s * omega
        psi_hat = norm_const * (sw ** m) * np.exp(-0.5 * sw ** 2)
        # pycwt energy normalization: sqrt(2 pi s / dt)
        psi_hat = psi_hat * np.sqrt(2.0 * np.pi * s / dt)
        W[j] = np.fft.ifft(x_hat * np.conj(psi_hat), n=n_fft)[:n]
    return W, scales


def get_lf0_cwt(lf0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N,) log-f0 -> ((N, 10) real CWT, scales).  Reference :179-195."""
    W, scales = cwt_mexican_hat(lf0, dt=0.005, dj=1.0, s0=0.01, J=9)
    return np.real(W).T, scales


def norm_scale(cwt: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Standardize each scale over time (reference :198-203)."""
    mean = cwt.mean(0)[None, :]
    std = cwt.std(0)[None, :]
    return (cwt - mean) / std, mean, std


def get_lf0_cwt_norm(f0s, mean, std):
    """Batch CWT of normalized continuous log-f0 (reference :215-241)."""
    out_specs, out_scales, means, stds = [], [], [], []
    for f0 in f0s:
        _, cont_lf0 = get_cont_lf0(f0)
        cont_norm = (cont_lf0 - mean) / std
        cwt, scales = get_lf0_cwt(cont_norm)
        cwt_norm, m, s = norm_scale(cwt)
        out_specs.append(cwt_norm)
        out_scales.append(scales)
        means.append(m)
        stds.append(s)
    return out_specs, out_scales, means, stds


# -- Autocorrelation pitch tracker (Praat to_pitch_ac substitute) -----------

def estimate_f0_acf(
    wav: np.ndarray,
    sr: int,
    hop_length: int,
    f0_floor: float = 80.0,
    f0_ceil: float = 750.0,
    voicing_threshold: float = 0.45,
) -> np.ndarray:
    """Frame-wise f0 via windowed normalized autocorrelation.

    Substitute for parselmouth's ``to_pitch_ac``
    (reference utils/pitch_tools.py:102-104); returns 0 for unvoiced
    frames.  Good enough for preprocessing parity at corpus scale; a
    dedicated tracker can be swapped in via the same signature.
    """
    frame_len = int(3 * sr / f0_floor)
    frame_len = min(frame_len, len(wav))
    n_frames = max(1 + (len(wav) - frame_len) // hop_length, 1) if len(wav) >= frame_len else 1
    lag_min = int(sr / f0_ceil)
    lag_max = min(int(sr / f0_floor), frame_len - 1)
    f0 = np.zeros(n_frames, dtype=np.float64)
    window = np.hanning(frame_len)
    for i in range(n_frames):
        start = i * hop_length
        frame = wav[start : start + frame_len]
        if len(frame) < frame_len:
            break
        frame = (frame - frame.mean()) * window
        power = float(np.dot(frame, frame))
        if power < 1e-9:
            continue
        ac = np.correlate(frame, frame, mode="full")[frame_len - 1 :]
        ac = ac / (ac[0] + 1e-12)
        seg = ac[lag_min : lag_max + 1]
        if seg.size == 0:
            continue
        k = int(np.argmax(seg)) + lag_min
        if ac[k] < voicing_threshold:
            continue
        # parabolic interpolation around the peak
        if 1 <= k < len(ac) - 1:
            denom = ac[k - 1] - 2 * ac[k] + ac[k + 1]
            delta = 0.5 * (ac[k - 1] - ac[k + 1]) / denom if abs(denom) > 1e-12 else 0.0
            k = k + float(np.clip(delta, -1, 1))
        f0[i] = sr / k
    return f0


def get_pitch(wav: np.ndarray, n_mel_frames: int, sr: int, hop_length: int):
    """f0 + coarse pitch aligned to the mel frames.

    Mirrors the reference alignment dance (utils/pitch_tools.py:81-118):
    pad the tracker output to the mel length with a small left pad.
    """
    f0 = estimate_f0_acf(wav, sr, hop_length)
    f0 = f0[: max(n_mel_frames - 8, 0)]
    pad_size = 2 if hop_length == 256 else 4
    lpad = pad_size * 2
    rpad = max(n_mel_frames - len(f0) - lpad, 0)
    f0 = np.pad(f0, (lpad, rpad), mode="constant")
    if len(f0) < n_mel_frames:
        f0 = np.concatenate([f0, np.full(n_mel_frames - len(f0), f0[-1] if len(f0) else 0.0)])
    f0 = f0[:n_mel_frames]
    return f0, f0_to_coarse_np(f0.copy())

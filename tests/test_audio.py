import numpy as np
import pytest

from cmtts_tpu.audio.stft import MelSpectrogram, mel_filterbank
from cmtts_tpu.audio import wavio
from cmtts_tpu.audio.pitch import (
    f0_to_coarse_np,
    f0_to_coarse_jnp,
    get_lf0_cwt,
    norm_scale,
    inverse_cwt_jnp,
    convert_continuous_f0,
    norm_interp_f0,
    estimate_f0_acf,
)
from cmtts_tpu.core.config import PitchConfig

import jax.numpy as jnp


def test_mel_filterbank_shape_and_partition():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # each filter has nonzero support
    assert (fb.sum(axis=1) > 0).all()


def test_mel_spectrogram_sine():
    sr = 22050
    stft = MelSpectrogram()
    t = np.arange(sr) / sr
    wav = 0.5 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mel, energy = stft(wav)
    assert mel.shape[0] == 80
    # torch.stft center=True gives 1 + T//hop frames
    assert mel.shape[1] == 1 + sr // 256
    assert energy.shape == (mel.shape[1],)
    # energy concentrated near the 440 Hz mel bin
    peak_bin = int(np.argmax(mel[:, mel.shape[1] // 2]))
    assert 5 <= peak_bin <= 20
    # log compression floor
    assert mel.min() >= np.log(1e-5) - 1e-4


def test_wav_roundtrip(tmp_path):
    sr = 22050
    wav = (np.sin(np.linspace(0, 100, 1000)) * 0.3).astype(np.float32)
    p = str(tmp_path / "x.wav")
    wavio.write_wav(p, wav, sr)
    back, sr2 = wavio.read_wav(p)
    assert sr2 == sr
    assert np.abs(back - wav).max() < 1e-3


def test_f0_to_coarse_parity():
    f0 = np.array([0.0, 50.0, 100.0, 440.0, 1100.0, 2000.0])
    coarse_np = f0_to_coarse_np(f0.copy())
    coarse_j = np.asarray(f0_to_coarse_jnp(jnp.asarray(f0)))
    assert coarse_np.min() >= 1 and coarse_np.max() <= 255
    np.testing.assert_array_equal(coarse_np, coarse_j)
    assert coarse_np[0] == 1  # unvoiced -> bin 1
    assert coarse_np[4] == 255  # f0_max -> top bin


def test_continuous_f0():
    f0 = np.array([0, 0, 100, 0, 120, 0, 0], dtype=np.float64)
    uv, cont = convert_continuous_f0(f0)
    np.testing.assert_array_equal(uv, [0, 0, 1, 0, 1, 0, 0])
    assert cont[0] == 100 and cont[-1] == 120
    assert cont[3] == pytest.approx(110.0)


def test_norm_interp_f0_log():
    cfg = PitchConfig(pitch_norm="log", use_uv=True)
    f0 = np.array([0.0, 100.0, 0.0, 200.0])
    out, uv = norm_interp_f0(f0, cfg)
    np.testing.assert_array_equal(uv, [1, 0, 1, 0])
    # interpolated gap between log2(100) and log2(200)
    assert np.log2(100) < out[2] < np.log2(200)


def test_cwt_shapes_and_inverse():
    rng = np.random.RandomState(0)
    lf0 = np.sin(np.linspace(0, 20, 300)) + 0.05 * rng.randn(300)
    cwt, scales = get_lf0_cwt(lf0)
    assert cwt.shape == (300, 10)
    assert len(scales) == 10
    assert scales[0] == pytest.approx(0.01)
    assert scales[-1] == pytest.approx(0.01 * 2 ** 9)
    cwt_norm, mean, std = norm_scale(cwt)
    assert abs(cwt_norm.mean()) < 1e-6
    # inverse reconstructs the dominant oscillation (up to scale/offset)
    rec = np.asarray(inverse_cwt_jnp(jnp.asarray(cwt_norm[None])))[0]
    target = (lf0 - lf0.mean()) / lf0.std()
    corr = np.corrcoef(rec, target)[0, 1]
    assert corr > 0.8


def test_inverse_cwt_masked_std_padding_invariant():
    """mask=valid-frames makes the reconstruction independent of how
    much zero padding follows the utterance (the pow2 synthesis buckets);
    mask=None reproduces the reference's padded standardization, which
    IS padding-dependent (the failure mode the flag fixes)."""
    rng = np.random.RandomState(1)
    lf0 = np.sin(np.linspace(0, 20, 300)) + 0.05 * rng.randn(300)
    cwt_norm, _, _ = norm_scale(get_lf0_cwt(lf0)[0])

    def padded(t_pad):
        spec = np.zeros((1, t_pad, 10), np.float32)
        spec[0, :300] = cwt_norm
        return jnp.asarray(spec)

    full = np.ones((1, 300), bool)
    base = np.asarray(inverse_cwt_jnp(padded(300), jnp.asarray(full)))[0, :300]
    for t_pad in (512, 768):
        mask = np.zeros((1, t_pad), bool)
        mask[0, :300] = True
        rec = np.asarray(
            inverse_cwt_jnp(padded(t_pad), jnp.asarray(mask)))[0, :300]
        np.testing.assert_allclose(rec, base, atol=1e-5)
        rec_ref = np.asarray(inverse_cwt_jnp(padded(t_pad)))[0, :300]
        assert np.abs(rec_ref - base).max() > 0.1  # reference path drifts

    # with no padding, masked and reference standardization coincide
    ref = np.asarray(inverse_cwt_jnp(padded(300)))[0, :300]
    np.testing.assert_allclose(base, ref, atol=1e-5)


def test_f0_tracker_sine():
    sr = 22050
    t = np.arange(sr) / sr
    wav = 0.4 * np.sin(2 * np.pi * 220.0 * t)
    f0 = estimate_f0_acf(wav, sr, 256)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert abs(np.median(voiced) - 220.0) < 5.0


# -- adversarial f0-tracker stress suite (VERDICT r2 missing/weak #4) -------
# The preprocessing tracker (estimate_f0_acf) is a stand-in for
# parselmouth's to_pitch_ac; wrong f0 targets silently degrade prosody
# training (SURVEY hard-part 3), so it gets stress-tested against bait
# signals and cross-checked against the independent in-repo YIN tracker
# (reference utils/pitch_tools.py:81-118 behavior surface).

def _sawtooth(f0_hz, sr, dur_s, rng=None):
    """Harmonic-rich voiced source (every harmonic, 1/k amplitudes)."""
    n = int(sr * dur_s)
    t = np.arange(n) / sr
    phase = 2 * np.pi * np.cumsum(np.broadcast_to(f0_hz, (n,))) / sr
    wav = np.zeros(n)
    for k in range(1, 30):
        wav += np.sin(k * phase) / k
    return 0.4 * wav / np.abs(wav).max()


def test_f0_tracker_vibrato():
    """Tracks a +-4% 5.5 Hz vibrato around 200 Hz within tight error."""
    from cmtts_tpu.audio.pitch import estimate_f0_acf

    sr, dur = 22050, 1.2
    n = int(sr * dur)
    t = np.arange(n) / sr
    f0_inst = 200.0 * (1.0 + 0.04 * np.sin(2 * np.pi * 5.5 * t))
    wav = _sawtooth(f0_inst, sr, dur)
    f0 = estimate_f0_acf(wav, sr, 256)
    voiced = f0 > 0
    assert voiced.mean() > 0.8
    # frame-wise instantaneous reference at frame centers
    centers = (np.arange(len(f0)) * 256 + int(3 * sr / 80.0) // 2)
    ref = 200.0 * (1.0 + 0.04 * np.sin(
        2 * np.pi * 5.5 * np.minimum(centers, n - 1) / sr))
    err = np.abs(f0[voiced] - ref[: len(f0)][voiced])
    # median error under 5 Hz; no octave errors at all
    assert np.median(err) < 5.0
    assert (np.abs(f0[voiced] / ref[: len(f0)][voiced] - 1.0) < 0.25).all()


def test_f0_tracker_octave_bait():
    """Strong 2nd harmonic (louder than the fundamental) must not trigger
    an octave-up error, and a missing fundamental must still resolve to
    the true periodicity (autocorrelation's strength)."""
    from cmtts_tpu.audio.pitch import estimate_f0_acf

    sr, dur, f0_true = 22050, 1.0, 150.0
    n = int(sr * dur)
    t = np.arange(n) / sr
    # 2nd harmonic 2x the fundamental's amplitude
    wav = 0.15 * np.sin(2 * np.pi * f0_true * t) \
        + 0.3 * np.sin(2 * np.pi * 2 * f0_true * t) \
        + 0.1 * np.sin(2 * np.pi * 3 * f0_true * t)
    f0 = estimate_f0_acf(wav, sr, 256)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert abs(np.median(voiced) - f0_true) < 5.0, np.median(voiced)

    # missing fundamental: harmonics 2..6 only, period still 1/150 s
    wav2 = sum(0.2 / k * np.sin(2 * np.pi * k * f0_true * t)
               for k in range(2, 7))
    f02 = estimate_f0_acf(np.asarray(wav2), sr, 256)
    voiced2 = f02[f02 > 0]
    assert len(voiced2) > 0.5 * len(f02)
    assert abs(np.median(voiced2) - f0_true) < 8.0, np.median(voiced2)


def test_f0_tracker_noise_robustness():
    """10 dB SNR additive white noise: voicing decisions stay sane and
    the f0 estimate stays within 5 Hz median error."""
    from cmtts_tpu.audio.pitch import estimate_f0_acf

    sr, dur, f0_true = 22050, 1.0, 180.0
    rng = np.random.RandomState(0)
    wav = _sawtooth(f0_true, sr, dur)
    sig_pow = (wav ** 2).mean()
    noise = rng.randn(len(wav)) * np.sqrt(sig_pow / 10.0)  # 10 dB SNR
    f0 = estimate_f0_acf(wav + noise, sr, 256)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.6 * len(f0)
    assert abs(np.median(voiced) - f0_true) < 5.0

    # pure noise must be predominantly unvoiced
    f0n = estimate_f0_acf(rng.randn(len(wav)) * 0.1, sr, 256)
    assert (f0n > 0).mean() < 0.2


def test_f0_tracker_creaky_low_f0():
    """Creaky-voice range (60 Hz, near the f0_floor=80 default): with the
    floor lowered the tracker locks on; with the default floor it must
    NOT report a spurious in-range harmonic (120 Hz would be octave-up)."""
    from cmtts_tpu.audio.pitch import estimate_f0_acf

    sr, dur, f0_true = 22050, 1.0, 60.0
    wav = _sawtooth(f0_true, sr, dur)
    f0_lo = estimate_f0_acf(wav, sr, 256, f0_floor=50.0)
    voiced_lo = f0_lo[f0_lo > 0]
    assert abs(np.median(voiced_lo) - f0_true) < 4.0

    f0_hi = estimate_f0_acf(wav, sr, 256)  # floor 80 Hz: 60 Hz out of range
    in_range = f0_hi[f0_hi > 0]
    # octave-up lock (120 Hz) is the failure mode being probed
    octave_locked = (np.abs(in_range - 2 * f0_true) < 6).mean() \
        if len(in_range) else 0.0
    assert octave_locked < 0.5, "tracker octave-locked on creaky voice"


def test_f0_tracker_cross_check_yin():
    """The preprocessing autocorrelation tracker and the independent YIN
    tracker must agree on identical realistic input (swept sawtooth):
    voiced-frame overlap >= 70%, median |Δf0| <= 10 Hz on co-voiced
    frames — a disagreement here means one tracker silently drifted."""
    from cmtts_tpu.audio.pitch import estimate_f0_acf
    from cmtts_tpu.metrics.yin import compute_yin

    sr, dur = 22050, 1.5
    n = int(sr * dur)
    t = np.arange(n) / sr
    f0_inst = 140.0 + 60.0 * t / dur  # 140 -> 200 Hz sweep
    wav = _sawtooth(f0_inst, sr, dur)
    wav[: n // 8] = 0.0   # leading silence
    wav[-n // 8:] = 0.0   # trailing silence

    f0_acf = estimate_f0_acf(wav, sr, 256)
    pitches, rates, argmins, times = compute_yin(
        wav, sr, w_len=1024, w_step=256)
    f0_yin = np.asarray(pitches)

    m = min(len(f0_acf), len(f0_yin))
    a, y = f0_acf[:m], f0_yin[:m]
    both = (a > 0) & (y > 0)
    either = (a > 0) | (y > 0)
    assert both.sum() / max(either.sum(), 1) > 0.7
    dd = np.abs(a[both] - y[both])
    assert np.median(dd) <= 10.0, float(np.median(dd))

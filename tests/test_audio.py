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


def test_f0_tracker_sine():
    sr = 22050
    t = np.arange(sr) / sr
    wav = 0.4 * np.sin(2 * np.pi * 220.0 * t)
    f0 = estimate_f0_acf(wav, sr, 256)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert abs(np.median(voiced) - 220.0) < 5.0

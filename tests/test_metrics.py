"""Metric suite: identity/sanity properties on synthetic signals."""

import os

import numpy as np
import pytest

from cmtts_tpu.audio.wavio import write_wav
from cmtts_tpu.metrics import core
from cmtts_tpu.metrics.dtw import dtw_cost, dtw_path
from cmtts_tpu.metrics.harness import Cal, CalOneModel
from cmtts_tpu.metrics.yin import compute_yin

SR = 22050


def tone(f0, dur=1.0, sr=SR, noise=0.0, seed=0):
    t = np.arange(int(sr * dur)) / sr
    w = 0.4 * np.sin(2 * np.pi * f0 * t)
    # add harmonics so YIN locks on the fundamental
    w += 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
    if noise:
        w += noise * np.random.RandomState(seed).randn(len(t))
    return w.astype(np.float32)


def test_yin_tracks_fundamental():
    f0, _, _, _ = compute_yin(tone(220.0), SR)
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    np.testing.assert_allclose(np.median(voiced), 220.0, rtol=0.02)


def test_dtw_identity_and_shift():
    x = np.random.RandomState(0).randn(30, 4)
    path = dtw_path(x, x)
    assert path[0] == (0, 0) and path[-1] == (29, 29)
    # identical sequences align along the diagonal with zero cost
    D = dtw_cost(x.T, x.T, lambda a, b: float(np.linalg.norm(a - b)))
    assert D[-1, -1] < 1e-9


def test_f0_rmse_and_corr():
    a = tone(220.0)
    assert core.f0_rmse(a, a) < 1.0  # ~0 cents against itself
    b = tone(220.0 * 2 ** (1 / 12))  # one semitone = 100 cents
    rmse = core.f0_rmse(a, b)
    assert 80 < rmse < 120
    # a gliding tone correlates with itself
    t = np.arange(SR) / SR
    glide = (0.4 * np.sin(2 * np.pi * (180 + 60 * t) * t)).astype(np.float32)
    assert core.f0_corr(glide, glide) > 0.99


def test_ffe_identity_and_mismatch():
    a = tone(220.0, noise=0.005)
    assert core.ffe(a, a) < 0.05
    b = tone(330.0, noise=0.005)  # 50% higher pitch -> gross errors
    assert core.ffe(a, b) > 0.5


def test_mcd_identity_and_ordering():
    a = tone(220.0, noise=0.01)
    b = tone(220.0, noise=0.01, seed=1)
    c = tone(500.0, noise=0.3, seed=2)
    assert core.mcd_dtw(a, a) < 1e-6
    assert core.mcd_dtw(a, b) < core.mcd_dtw(a, c)
    mean_cost, frames = core.mcd24(a, a)
    assert frames > 0


def test_ssim_bounds():
    img = np.random.RandomState(0).rand(40, 20)
    assert core.ssim_2d(img, img, data_range=1.0) == pytest.approx(1.0)
    other = np.random.RandomState(1).rand(40, 20)
    assert core.ssim_2d(img, other, data_range=1.0) < 0.5


def test_si_sdr_identity():
    a = tone(220.0, noise=0.01)
    assert core.si_sdr(a, a) > 40
    noisy = a + 0.1 * np.random.RandomState(3).randn(len(a)).astype(np.float32)
    assert core.si_sdr(noisy, a) < core.si_sdr(a, a)


def test_mel_sdr():
    m = np.random.RandomState(0).rand(50, 80).astype(np.float32)
    assert core.mel_sdr(m, m) > 80
    assert core.mel_sdr(m + 0.5, m) < 10


def test_wer():
    assert core.wer("the cat sat", "the cat sat") == 0.0
    assert core.wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)
    assert core.wer("hello world", "Hello, world!") == 0.0  # normalization
    assert core.wer("a b c d", "a b") == pytest.approx(0.5)


def test_frechet_distance_and_pr():
    rng = np.random.RandomState(0)
    x = rng.randn(400, 8)
    y = rng.randn(400, 8)
    z = rng.randn(400, 8) + 5.0
    assert core.frechet_distance(x, y) < 0.5
    assert core.frechet_distance(x, z) > 10
    p_same, r_same = core.manifold_precision_recall(x[:200], y[:200])
    p_far, r_far = core.manifold_precision_recall(z[:200], x[:200])
    assert p_same > 0.8 and r_same > 0.8
    assert p_far < 0.2 and r_far < 0.2


def test_gmm_kl_orders():
    rng = np.random.RandomState(0)
    x = rng.randn(300, 5)
    near = rng.randn(300, 5)
    far = rng.randn(300, 5) * 3 + 4
    assert core.gmm_kl(x, near, n_components=3) < core.gmm_kl(x, far, n_components=3)


def test_mfcc_cos_identity():
    a = tone(220.0, noise=0.01)
    assert core.mfcc_cos(a, a) == pytest.approx(1.0, abs=1e-6)


@pytest.fixture(scope="module")
def results_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("results")
    raw = root / "raw"
    raw.mkdir()
    for step in (100, 200):
        sub = root / "syn" / str(step)
        sub.mkdir(parents=True)
        for i in range(2):
            name = f"LJ001-{i:04d}.wav"
            clean = tone(200.0 + 20 * i, dur=0.7, noise=0.01, seed=i)
            write_wav(str(raw / name), clean, SR)
            noisy = clean + (0.002 * step / 100) * np.random.RandomState(
                step + i).randn(len(clean)).astype(np.float32)
            write_wav(str(sub / name), noisy, SR)
    return root


def test_cal_harness(results_tree):
    root = results_tree
    cal = Cal(str(root / "syn" / "100"), data_type="LJSpeech",
              raw_folder=str(root / "raw"))
    assert len(cal.syn2label) == 2
    vals = cal.get_metrics_by_list(["mcd", "ffe"])
    assert len(vals) == 2
    # near-identical audio: low-noise bands still dominate the log-mel
    # cepstra, so just check the value is finite and in a sane range
    assert 0 <= vals[0] < 15.0
    assert 0 <= vals[1] <= 1


def test_cal_file_match_libritts(tmp_path):
    """LibriTTS speaker-subdir layout: `84_121123_..._0001.wav` -> raw
    under raw_folder/84/ (same matching family as VCTK)."""
    raw = tmp_path / "raw" / "84"
    syn = tmp_path / "syn"
    raw.mkdir(parents=True)
    syn.mkdir()
    name = "84_121123_000007_000001.wav"
    w = tone(220.0, dur=0.3)
    write_wav(str(raw / name), w, SR)
    write_wav(str(syn / name), w, SR)
    cal = Cal(str(syn), data_type="LibriTTS",
              raw_folder=str(tmp_path / "raw"))
    assert cal.syn2label == {str(syn / name): str(raw / name)}


def test_cal_meta_txt_keeps_piped_raw_text(tmp_path):
    """raw_text may contain '|' — maxsplit parsing keeps it whole
    (reference fill_base_name2text, all_metrics.py:233-254)."""
    syn = tmp_path / "syn"
    syn.mkdir()
    meta = tmp_path / "val.txt"
    meta.write_text('utt1|spk|{HH AH0}|he said "this | that"\n')
    cal = Cal(str(syn), data_type="LJSpeech", raw_folder=str(tmp_path),
              meta_txt=[str(meta)])
    assert cal.text_lookup["utt1"] == 'he said "this | that"'


def test_cal_one_model_csv(results_tree):
    root = results_tree
    tool = CalOneModel(str(root / "syn"), raw_folder=str(root / "raw"),
                       data_type="LJSpeech")
    csv_path = tool.get_model_metrics_by_list(["mcd"])
    assert os.path.exists(csv_path)
    rows = open(csv_path).read().strip().splitlines()
    assert rows[0] == "train_step,mcd"
    assert len(rows) == 3
    assert rows[1].startswith("100,") and rows[2].startswith("200,")


# -- true MCEP (SPTK mcep semantics, VERDICT r1 item 6) ----------------------
def test_freqt_alpha_zero_is_truncation():
    from cmtts_tpu.metrics.features import freqt

    rng = np.random.RandomState(0)
    c = rng.randn(3, 11)
    out = freqt(c, 6, 0.0)
    np.testing.assert_allclose(out, c[:, :7], atol=1e-12)
    # order beyond input: zero-padded
    out2 = freqt(c, 14, 0.0)
    np.testing.assert_allclose(out2[:, :11], c, atol=1e-12)
    np.testing.assert_allclose(out2[:, 11:], 0.0, atol=1e-12)


def test_freqt_inverse_roundtrip():
    """freqt(-alpha) inverts freqt(alpha) through a high-order
    intermediate (the all-pass warp is invertible)."""
    from cmtts_tpu.metrics.features import freqt

    rng = np.random.RandomState(1)
    c = rng.randn(2, 9) * np.exp(-0.5 * np.arange(9))  # decaying cepstrum
    warped = freqt(c, 64, 0.435)
    back = freqt(warped, 8, -0.435)
    np.testing.assert_allclose(back, c, rtol=1e-5, atol=1e-7)


def test_sptk_mcep_alpha_zero_is_real_cepstrum():
    from cmtts_tpu.metrics.features import sptk_mcep_from_spectrum

    rng = np.random.RandomState(2)
    n_half = 256
    sp = np.exp(rng.randn(4, n_half + 1) * 0.3 + 1.0)
    mc = sptk_mcep_from_spectrum(sp, order=24, alpha=0.0, eps=1e-8)
    logp = np.log(sp * sp + 1e-8)
    cep = np.fft.irfft(logp, n=2 * n_half, axis=1)[:, : n_half + 1]
    cep[:, 0] /= 2.0
    cep[:, n_half] /= 2.0
    np.testing.assert_allclose(mc, cep[:, :25], rtol=1e-9, atol=1e-12)


def test_sptk_mcep_flat_spectrum():
    """A flat amplitude spectrum has only the c0 cepstral term; the
    all-pass warp keeps DC at DC."""
    from cmtts_tpu.metrics.features import sptk_mcep_from_spectrum

    sp = np.full((1, 257), 2.0)
    mc = sptk_mcep_from_spectrum(sp, order=24, alpha=0.435, eps=0.0)
    np.testing.assert_allclose(mc[0, 0], np.log(4.0) / 2, rtol=1e-9)
    np.testing.assert_allclose(mc[0, 1:], 0.0, atol=1e-9)


def test_cheaptrick_envelope_tracks_formant():
    """The envelope of a pure tone must peak near the tone frequency and
    be smooth (harmonic ripple removed)."""
    from cmtts_tpu.metrics.features import cheaptrick_envelope

    sr = 22050
    t = np.arange(int(sr * 0.5)) / sr
    f0 = 220.0
    wav = (np.sin(2 * np.pi * f0 * t) +
           0.5 * np.sin(2 * np.pi * 2 * f0 * t)).astype(np.float64)
    sp = cheaptrick_envelope(wav, sr, f0=np.full(101, f0))
    freqs = np.arange(sp.shape[1]) * sr / 512
    mid = sp[sp.shape[0] // 2]
    peak_hz = freqs[np.argmax(mid)]
    assert abs(peak_hz - f0) < 120  # within ~3 bins of the fundamental
    assert np.isfinite(sp).all() and (sp > 0).all()


def test_true_mcd_identity_ordering_and_dctmel():
    rng = np.random.RandomState(3)
    t = np.arange(22050 // 2) / 22050
    a = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    b = (np.sin(2 * np.pi * 220 * t) * (1 + 0.1 * np.sin(2 * np.pi * 3 * t))
         ).astype(np.float32) + 0.01 * rng.randn(len(t)).astype(np.float32)
    c = rng.randn(len(t)).astype(np.float32)
    assert core.mcd_dtw(a, a) < 1e-6
    assert core.mcd_dtw(a, b) < core.mcd_dtw(a, c)
    assert core.mcd_dctmel(a, a) < 1e-6
    assert core.mcd_dctmel(a, b) < core.mcd_dctmel(a, c)


# -- pluggable WER transcriber (VERDICT r1 item 9) ---------------------------
def test_wer_counts_and_corpus_level():
    # per-utterance
    assert core.wer("the cat sat", "the cat sat") == 0.0
    assert core.wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)
    # corpus-level accumulation != mean of per-file rates
    e1, n1 = core.wer_counts("a b", "a x")          # 1/2
    e2, n2 = core.wer_counts("a b c d e f", "a b c d e f")  # 0/6
    assert (e1 + e2) / (n1 + n2) == pytest.approx(1 / 8)


def test_make_transcriber_contract():
    fn = lambda wav, sr: "hello"
    assert core.make_transcriber(fn) is fn
    assert core.make_transcriber(None) is None
    with pytest.raises(TypeError):
        core.make_transcriber(123)
    # a bogus local path must raise loudly (not degrade to None)
    with pytest.raises(Exception):
        core.make_transcriber("/nonexistent/whisper-weights")


def test_cal_wer_mocked_end_to_end(results_tree):
    """Mocked transcriber through Cal + CalOneModel (VERDICT r1 item 9):
    metadata-txt transcript lookup, corpus-level WER, Awer_output.txt."""
    import csv

    root = results_tree
    meta = root / "meta.txt"
    with open(meta, "w") as f:
        f.write("LJ001-0000|LJ|{HH AH0}|the cat sat\n")
        f.write("LJ001-0001|LJ|{HH AH0}|a dog barks\n")

    hyps = {"LJ001-0000": "the cat sat", "LJ001-0001": "a dog sleeps"}
    calls = []

    def fake_asr(wav, sr):
        calls.append(len(wav))
        # dispatch on which wav we got by matching lengths is fragile;
        # return per-call in syn2label order instead (cycling, since
        # CalOneModel calls once per wav per step subdir)
        return list(hyps.values())[(len(calls) - 1) % len(hyps)]

    cal = Cal(str(root / "syn" / "100"), data_type="LJSpeech",
              raw_folder=str(root / "raw"), transcriber=fake_asr,
              meta_txt=[str(meta)])
    got = cal.compute_wer()
    # 0 edits over 3 words + 1 edit over 3 words = 1/6
    assert got == pytest.approx(1 / 6)
    dump = (root / "syn" / "100" / "Awer_output.txt").read_text()
    assert "ref the cat sat" in dump and "hyp a dog sleeps" in dump

    # through CalOneModel (cal_kwargs forwarding)
    calls.clear()
    tool = CalOneModel(str(root / "syn"), raw_folder=str(root / "raw"),
                       data_type="LJSpeech", transcriber=fake_asr,
                       meta_txt=[str(meta)])
    csv_path = tool.get_model_metrics_by_list(["wer"])
    rows = list(csv.reader(open(csv_path)))
    assert rows[0] == ["train_step", "wer"]
    assert len(rows) == 3

    # no transcripts matched -> informative error
    cal2 = Cal(str(root / "syn" / "100"), data_type="LJSpeech",
               raw_folder=str(root / "raw"), transcriber=fake_asr)
    with pytest.raises(RuntimeError, match="transcripts"):
        cal2.compute_wer()


def test_all_metrics_cli_speaker_embedder_ckpt(tmp_path):
    """`cli/all_metrics.py --speaker_embedder_ckpt` loads a GE2E
    checkpoint (the in-repo trainer's .npy layout) and uses it for
    speaker_cos (reference uses Resemblyzer, all_metrics.py:561-601)."""
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    from cmtts_tpu.models.speaker import (GE2E_MEL_CHANNELS,
                                          GE2E_PARTIAL_FRAMES, GE2EEncoder)

    raw = tmp_path / "raw"
    syn = tmp_path / "syn"
    raw.mkdir()
    syn.mkdir()
    w = tone(200.0, dur=1.2, noise=0.01)
    write_wav(str(raw / "a.wav"), w, SR)
    write_wav(str(syn / "a.wav"), w, SR)

    params = GE2EEncoder().init(
        jax.random.PRNGKey(4),
        jnp.zeros((1, GE2E_PARTIAL_FRAMES, GE2E_MEL_CHANNELS)))["params"]
    import jax.tree_util as jtu
    blob = {"encoder": jtu.tree_map(np.asarray, params),
            "sim_weight": np.asarray(10.0), "sim_bias": np.asarray(-5.0)}
    ckpt = tmp_path / "ge2e_params.npy"
    np.save(str(ckpt), np.asarray([blob], dtype=object), allow_pickle=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "cli", "all_metrics.py"),
         "--syn_root", str(syn), "--raw_folder", str(raw),
         "--data_type", "LJSpeech", "--single", "--metrics", "speaker_cos",
         "--speaker_embedder_ckpt", str(ckpt)],
        capture_output=True, text=True, env=env, cwd=repo)
    assert out.returncode == 0, out.stderr
    val = float(out.stdout.strip().split("speaker_cos:")[1])
    # identical wavs -> cosine 1.0 under any embedder
    np.testing.assert_allclose(val, 1.0, atol=1e-3)

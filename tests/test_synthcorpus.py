"""Multi-speaker parametric corpus: layout, determinism, speaker
separability, and zero-shot phone-string consistency with the
preprocessor's alignment semantics."""

import os
import subprocess
import sys

import numpy as np
import pytest

from cmtts_tpu.data.synthcorpus import (HOP, SR, generate_multispeaker_corpus,
                                        sample_utterance, speaker_profile,
                                        synthesize, f0_contour)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_speaker_profiles_deterministic_and_distinct():
    profs = [speaker_profile(np.random.RandomState(7 * 31 + i))
             for i in range(8)]
    again = [speaker_profile(np.random.RandomState(7 * 31 + i))
             for i in range(8)]
    assert profs == again
    f0s = [p["f0_base"] for p in profs]
    scales = [p["formant_scale"] for p in profs]
    assert len(set(round(f, 3) for f in f0s)) == len(f0s)
    assert max(scales) - min(scales) > 0.05


def test_holdout_profiles_keep_min_distance_from_train():
    """Zero-shot holdout voices must be NOVEL: normalized profile
    distance >= 0.3 to every training speaker (round-4 failure: an
    iid-sampled holdout landed at ~0.1 from a train voice and the
    GE2E ranking eval confused them at cos 0.94 despite the encoder
    generalizing fine)."""
    from cmtts_tpu.data.synthcorpus import (holdout_speaker_profile,
                                            profile_distance)

    for seed in (5, 7777, 1234):
        train = [speaker_profile(np.random.RandomState(seed * 31 + i))
                 for i in range(32)]
        for hi in (32, 33):
            hold = holdout_speaker_profile(
                np.random.RandomState(seed * 31 + hi), train)
            dmin = min(profile_distance(hold, t) for t in train)
            assert dmin >= 0.3, (seed, hi, dmin)
        # determinism: the same rng stream reproduces the same profile
        again = holdout_speaker_profile(
            np.random.RandomState(seed * 31 + 32), train)
        assert again == holdout_speaker_profile(
            np.random.RandomState(seed * 31 + 32), train)


def test_profile_changes_spectrum_not_alignment():
    """Two speakers rendering the SAME phone/duration sequence must
    differ acoustically (formant scale shifts the spectral centroid)
    while keeping the identical frame alignment."""
    rng = np.random.RandomState(0)
    phones, durs = sample_utterance(rng)
    f0 = f0_contour(phones, durs, np.random.RandomState(1), base=150.0)
    lo = dict(formant_scale=0.85, f0_base=150.0, tilt=3500.0, breathiness=1.0)
    hi = dict(formant_scale=1.20, f0_base=150.0, tilt=3500.0, breathiness=1.0)
    w_lo = synthesize(phones, durs, f0, np.random.RandomState(2), profile=lo)
    w_hi = synthesize(phones, durs, f0, np.random.RandomState(2), profile=hi)
    assert len(w_lo) == len(w_hi) == int(np.sum(durs)) * HOP

    def centroid(w):
        spec = np.abs(np.fft.rfft(w))
        freqs = np.fft.rfftfreq(len(w), 1.0 / SR)
        return float((spec * freqs).sum() / (spec.sum() + 1e-9))

    assert centroid(w_hi) > centroid(w_lo) * 1.1


def test_multispeaker_corpus_layout_and_holdout(tmp_path):
    raw = str(tmp_path / "raw")
    pre = str(tmp_path / "pre")
    train_spk, hold_spk, phones = generate_multispeaker_corpus(
        raw, pre, n_speakers=3, utts_per_speaker=2, seed=5,
        holdout_speakers=1)
    assert train_spk == ["v00", "v01"] and hold_spk == ["v02"]
    # train speakers under raw/, holdout strictly separated
    assert sorted(os.listdir(raw)) == ["v00", "v01"]
    assert os.listdir(raw + "_holdout") == ["v02"]
    # VCTK TextGrid layout: TextGrid/<speaker>/<base>.TextGrid
    assert os.path.exists(
        os.path.join(pre, "TextGrid", "v00", "v00_000.TextGrid"))
    assert os.path.exists(os.path.join(
        pre + "_holdout", "TextGrid", "v02", "v02_000.TextGrid"))
    assert set(phones) == {(s, f"{s}_{u:03d}")
                           for s in ("v00", "v01", "v02") for u in range(2)}
    # deterministic regeneration
    _, _, phones2 = generate_multispeaker_corpus(
        str(tmp_path / "raw2"), str(tmp_path / "pre2"), n_speakers=3,
        utts_per_speaker=2, seed=5, holdout_speakers=1)
    assert phones == phones2
    w1 = np.fromfile(os.path.join(raw, "v00", "v00_000.wav"), np.uint8)
    w2 = np.fromfile(os.path.join(str(tmp_path / "raw2"), "v00",
                                  "v00_000.wav"), np.uint8)
    assert np.array_equal(w1, w2)


def test_zeroshot_source_matches_alignment(tmp_path):
    """The {PH ...} strings gen_corpus writes for held-out utterances
    must equal what the preprocessor's get_alignment would produce from
    the same TextGrid (boundary-sil trimming, interior sp kept) — token
    ids at zero-shot time then match train-time ids exactly."""
    out = str(tmp_path / "corpus")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "gen_corpus.py"),
         "--out", out, "--speakers", "2", "--utts_per_speaker", "2",
         "--holdout", "1", "--tiny", "--val_size", "1",
         "--batch_size", "1"],
        check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True)
    src = os.path.join(out, "zeroshot_source.txt")
    lines = [ln.strip().split("|") for ln in open(src)]
    assert lines and all(len(ln) == 4 for ln in lines)

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.data.preprocessor import Preprocessor
    from cmtts_tpu.data.textgrid import read_textgrid

    cfg = load_configs("VCTK", os.path.join(out, "config"))
    prep = Preprocessor(cfg)
    for base, _dummy_spk, text, _raw in lines:
        spk = base.split("_")[0]
        tg = os.path.join(out, "pre_holdout", "TextGrid", spk,
                          f"{base}.TextGrid")
        tiers = read_textgrid(tg)
        phones, *_ = prep.get_alignment(tiers["phones"].intervals)
        assert "{" + " ".join(phones) + "}" == text


def test_predefined_embedder_loads_trainer_npy(tmp_path):
    """PreDefinedEmbedder accepts the in-repo GE2E trainer's
    ge2e_params.npy output (train/ge2e_trainer.py:153-156)."""
    import jax
    import jax.numpy as jnp

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.models.speaker import (GE2E_MEL_CHANNELS,
                                          GE2E_PARTIAL_FRAMES, GE2EEncoder,
                                          PreDefinedEmbedder)

    model = GE2EEncoder()
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, GE2E_PARTIAL_FRAMES,
                                   GE2E_MEL_CHANNELS)))["params"]
    blob = {"encoder": jax.tree_util.tree_map(np.asarray, params),
            "sim_weight": np.asarray(10.0), "sim_bias": np.asarray(-5.0)}
    path = str(tmp_path / "ge2e_params.npy")
    np.save(path, np.asarray([blob], dtype=object), allow_pickle=True)

    import dataclasses
    cfg = load_configs("VCTK")
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, speaker_embedder="GE2E"))
    emb = PreDefinedEmbedder(cfg, path)
    rng = np.random.RandomState(0)
    e = emb(rng.randn(22050).astype(np.float32) * 0.1)
    assert e.shape == (256,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, atol=1e-3)


def test_deterministic_prosody_contour_is_text_function():
    """det mode: the f0 contour is a pure function of (phones, durs,
    base) — rng must not influence it; the legacy mode must keep its
    rng dependence (bit-for-bit corpus regeneration)."""
    import numpy as np

    from cmtts_tpu.data.synthcorpus import f0_contour, sample_utterance

    rng = np.random.RandomState(0)
    phones, durs = sample_utterance(rng, (3, 5))
    a = f0_contour(phones, durs, np.random.RandomState(1), base=180.0,
                   deterministic=True)
    b = f0_contour(phones, durs, np.random.RandomState(2), base=180.0,
                   deterministic=True)
    np.testing.assert_array_equal(a, b)
    # accents present: contour is not the bare declination on voiced
    # vowel frames
    assert a.max() > 180.0 * 1.12
    c = f0_contour(phones, durs, np.random.RandomState(1), base=180.0)
    d = f0_contour(phones, durs, np.random.RandomState(2), base=180.0)
    assert np.abs(c - d).max() > 0


def test_deterministic_prosody_fixed_register(tmp_path):
    """det corpora pin the per-utterance base f0: two runs of
    generate_corpus with different seeds keep per-utterance contours'
    voiced medians close to the fixed register (no ±15 % register
    lottery)."""
    import numpy as np

    from cmtts_tpu.data.synthcorpus import HOP, SR, generate_corpus
    from cmtts_tpu.audio.wavio import read_wav

    names = generate_corpus(str(tmp_path / "raw"), str(tmp_path / "pre"),
                            n_utts=2, seed=5, deterministic_prosody=True)
    assert len(names) == 2
    wav, sr = read_wav(str(tmp_path / "raw" / "SYN" / f"{names[0]}.wav"))
    assert sr == SR and len(wav) % HOP == 0

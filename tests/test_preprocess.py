"""End-to-end data pipeline: synthetic corpus -> preprocess -> dataset."""

import json
import os

import numpy as np
import pytest

from cmtts_tpu.audio.wavio import write_wav
from cmtts_tpu.core.config import load_yaml_configs, config_from_dicts
from cmtts_tpu.data.preprocessor import Preprocessor
from cmtts_tpu.data.textgrid import read_textgrid
from cmtts_tpu.data.dataset import FeatureDataset, batch_iterator, collate_batch


def _make_textgrid(path, phones_with_times):
    xmax = phones_with_times[-1][1]
    lines = [
        'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
        "xmin = 0", f"xmax = {xmax}", "tiers? <exists>", "size = 1",
        "item []:", "    item [1]:", '        class = "IntervalTier"',
        '        name = "phones"', "        xmin = 0",
        f"        xmax = {xmax}",
        f"        intervals: size = {len(phones_with_times)}",
    ]
    for i, (s, e, p) in enumerate(phones_with_times):
        lines += [f"        intervals [{i+1}]:", f"            xmin = {s}",
                  f"            xmax = {e}", f'            text = "{p}"']
    with open(path, "w") as f:
        f.write("\n".join(lines))


@pytest.fixture(scope="module")
def mini_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    raw = root / "raw" / "LJSpeech"
    pre = root / "preprocessed"
    raw.mkdir(parents=True)
    (pre / "TextGrid" / "LJSpeech").mkdir(parents=True)

    sr = 22050
    rng = np.random.RandomState(0)
    for i in range(3):
        base = f"utt{i:03d}"
        dur_s = 1.2
        t = np.arange(int(sr * dur_s)) / sr
        f0 = 150 + 30 * i
        wav = 0.4 * np.sin(2 * np.pi * f0 * t) * (0.7 + 0.3 * np.sin(2 * np.pi * 2 * t))
        wav += 0.01 * rng.randn(len(wav))
        write_wav(str(raw / f"{base}.wav"), wav.astype(np.float32), sr)
        with open(raw / f"{base}.lab", "w") as f:
            f.write("hello world")
        _make_textgrid(
            str(pre / "TextGrid" / "LJSpeech" / f"{base}.TextGrid"),
            [(0.0, 0.1, "sil"), (0.1, 0.5, "HH"), (0.5, 0.9, "AH0"),
             (0.9, 1.1, "L"), (1.1, 1.2, "sp")])
    return root, raw, pre


@pytest.fixture(scope="module")
def mini_config(mini_corpus):
    root, raw, pre = mini_corpus
    p, m, t = load_yaml_configs("LJSpeech")
    p["path"]["raw_path"] = str(raw.parent)
    p["path"]["preprocessed_path"] = str(pre)
    p["preprocessing"]["val_size"] = 1
    cfg = config_from_dicts(p, m, t)
    return cfg


def test_textgrid_parser(mini_corpus):
    root, raw, pre = mini_corpus
    tiers = read_textgrid(str(pre / "TextGrid" / "LJSpeech" / "utt000.TextGrid"))
    assert "phones" in tiers
    ivs = tiers["phones"].intervals
    assert len(ivs) == 5
    assert ivs[1].text == "HH"
    assert ivs[1].start_time == pytest.approx(0.1)


def test_preprocessor_end_to_end(mini_config):
    cfg = mini_config
    # raw path points at parent; preprocessor expects raw/<speaker>/
    import dataclasses
    cfg2 = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, raw_path=cfg.data.raw_path))
    pp = Preprocessor(cfg2, dataset_type="LJspeech")
    train, val = pp.build_from_path()
    assert len(train) == 2 and len(val) == 1

    pre = cfg.data.preprocessed_path
    stats = json.load(open(os.path.join(pre, "stats.json")))
    assert stats["f0"][0] > 50  # tracked the sine f0
    assert len(stats["spec_min"]) == 80
    for kind in ("mel", "f0", "pitch", "energy", "duration", "mel2ph",
                 "cwt_spec", "f0cwt_mean_std"):
        files = os.listdir(os.path.join(pre, kind))
        assert len(files) == 3, kind

    # alignment invariants: len(mel) == sum(durations) == len(mel2ph)
    mel = np.load(os.path.join(pre, "mel", "LJSpeech-mel-utt000.npy"))
    dur = np.load(os.path.join(pre, "duration", "LJSpeech-duration-utt000.npy"))
    m2p = np.load(os.path.join(pre, "mel2ph", "LJSpeech-mel2ph-utt000.npy"))
    assert mel.shape[0] == dur.sum() == len(m2p)
    assert mel.shape[1] == 80
    # silences trimmed: 3 phones remain (HH AH0 L)
    assert len(dur) == 3
    assert m2p.max() == 3


def test_feature_dataset_and_batching(mini_config):
    cfg = mini_config
    ds = FeatureDataset("train.txt", cfg, sort=True)
    assert len(ds) == 2
    sample = ds[0]
    assert sample["mel"].shape[1] == 80
    assert sample["text"].ndim == 1
    assert "cwt_spec" in sample

    batch = collate_batch([ds[0], ds[1]], cfg,
                          text_buckets=(8,), mel_buckets=(128,))
    assert batch["texts"].shape == (2, 8)
    assert batch["mels"].shape == (2, 128, 80)
    assert batch["p_targets"]["cwt_spec"].shape == (2, 128, 10)
    assert batch["mel2ph"].shape == (2, 128)

    it = batch_iterator(ds, batch_size=1, group_size=2, epochs=1,
                        text_buckets=(8,), mel_buckets=(128,))
    batches = list(it)
    assert len(batches) == 2
    assert batches[0]["texts"].shape[0] == 1


def test_feature_dataset_ram_cache(mini_config):
    """Cached samples == uncached samples; after the first pass the
    cache serves without touching the loaders at all."""
    cfg = mini_config
    cold = FeatureDataset("train.txt", cfg, cache_in_ram=False)
    warm = FeatureDataset("train.txt", cfg, cache_in_ram=True)

    def assert_same(a, b):
        assert a.keys() == b.keys()
        for k, v in a.items():
            if isinstance(v, np.ndarray):
                np.testing.assert_array_equal(v, b[k])
            else:
                assert v == b[k]

    for i in range(len(cold)):
        assert_same(cold[i], warm[i])
    for a, b in zip(cold.get_many([0, 1]), warm.get_many([0, 1])):
        assert_same(a, b)

    # cache must now serve without any loading
    def boom(*a, **k):
        raise AssertionError("loader touched after cache warm")

    warm._load_one = boom
    warm._load_many = boom
    assert_same(cold[0], warm[0])
    for a, b in zip(cold.get_many([1, 0]), warm.get_many([1, 0])):
        assert_same(a, b)
    # returned dicts are fresh per call (callers may add keys)
    s1 = warm[0]
    s1["extra"] = 1
    assert "extra" not in warm[0]


def test_speaker_embedding_tsne_plot(tmp_path):
    """t-SNE speaker-embedding scatter parity hook (reference
    preprocessor.py:220-225 + utils/tools.py:630-648)."""
    import numpy as np

    from cmtts_tpu.utils_plot import (
        load_speaker_embeddings, plot_embedding, speaker_gender_map)

    emb_dir = tmp_path / "spker_embed"
    emb_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        np.save(emb_dir / f"p{i:03d}-spker_embed.npy",
                rng.normal(size=64).astype(np.float32))
    emb, ids = load_speaker_embeddings(str(emb_dir))
    assert emb.shape == (6, 64) and ids[0] == "p000"

    corpus = tmp_path / "VCTK-Corpus"
    corpus.mkdir()
    (corpus / "speaker-info.txt").write_text(
        "ID  AGE  GENDER  ACCENTS\n"
        + "".join(f"p{i:03d}  23  {'M' if i % 2 else 'F'}  English\n"
                  for i in range(6)))
    genders = speaker_gender_map(str(corpus), "VCTK")
    assert genders["p001"] == "M" and genders["p000"] == "F"

    out = plot_embedding(str(tmp_path), emb, ids, genders)
    import os

    assert out and os.path.isfile(out)

    # tiny-corpus PCA fallback (t-SNE needs perplexity < n)
    out2 = plot_embedding(str(tmp_path), emb[:2], ids[:2], genders,
                          filename="tiny.png")
    assert out2 and os.path.isfile(out2)


def test_alignment_with_mfa_empty_silences(tmp_path):
    """Modern MFA writes silence intervals with EMPTY text (older MFA
    wrote sil/sp/spn, the only labels the reference handles,
    preprocessor.py:359).  Empty-text intervals must be trimmed at the
    edges and mapped to a real 'sp' token inside, so the metadata text
    tokenizes to exactly len(duration) phones — a mismatch poisons the
    mel2ph gather for the whole batch."""
    import dataclasses

    raw = tmp_path / "raw" / "SYN"
    pre = tmp_path / "pre"
    raw.mkdir(parents=True)
    (pre / "TextGrid" / "LJSpeech").mkdir(parents=True)
    sr = 22050
    t = np.arange(int(sr * 1.2)) / sr
    wav = 0.4 * np.sin(2 * np.pi * 180 * t)
    write_wav(str(raw / "u0.wav"), wav.astype(np.float32), sr)
    (raw / "u0.lab").write_text("x")
    _make_textgrid(
        str(pre / "TextGrid" / "LJSpeech" / "u0.TextGrid"),
        [(0.0, 0.1, ""), (0.1, 0.4, "HH"), (0.4, 0.6, "AH0"),
         (0.6, 0.7, ""), (0.7, 1.0, "L"), (1.0, 1.2, "")])

    p, m, tr = load_yaml_configs("LJSpeech")
    p["path"]["raw_path"] = str(tmp_path / "raw")
    p["path"]["preprocessed_path"] = str(pre)
    p["preprocessing"]["val_size"] = 0
    cfg = config_from_dicts(p, m, tr)
    pp = Preprocessor(cfg, dataset_type="LJspeech")
    pp.build_from_path()

    line = open(pre / "train.txt").readline().strip().split("|")
    phones = line[2].strip("{}").split()
    dur = np.load(pre / "duration" / "SYN-duration-u0.npy")
    m2p = np.load(pre / "mel2ph" / "SYN-mel2ph-u0.npy")
    # edges trimmed, interior "" became sp: HH AH0 sp L
    assert phones == ["HH", "AH0", "sp", "L"], phones
    assert len(dur) == len(phones)
    assert m2p.max() == len(phones)

    from cmtts_tpu.text import text_to_sequence
    assert len(text_to_sequence(line[2], cfg.data.text_cleaners)) == len(dur)


def test_dataset_rejects_desynced_alignment(mini_config):
    """FeatureDataset must fail loudly (naming the utterance) when the
    metadata text tokenizes to a different phone count than the stored
    duration — the failure mode that silently NaN'd training via
    out-of-bounds mel2ph before."""
    import shutil

    cfg = mini_config
    pre = cfg.data.preprocessed_path
    train_txt = os.path.join(pre, "train.txt")
    backup = train_txt + ".bak"
    shutil.copy(train_txt, backup)
    try:
        lines = open(train_txt).read().splitlines()
        parts = lines[0].split("|")
        parts[2] = "{HH AH0 L AH0 EXTRA W IH1}"  # wrong phone count
        lines[0] = "|".join(parts)
        open(train_txt, "w").write("\n".join(lines) + "\n")
        ds = FeatureDataset("train.txt", cfg, sort=False)
        with pytest.raises(ValueError, match="out of sync"):
            for i in range(len(ds)):
                ds[i]
    finally:
        shutil.move(backup, train_txt)


def test_preprocessor_parallel_matches_serial(mini_config, tmp_path):
    """build_from_path(workers=2) must produce identical features/stats
    to the serial path (spawn pool, CPU-pinned workers)."""
    import dataclasses
    import shutil as sh

    cfg = mini_config
    # fresh preprocessed dirs need the fixture's TextGrid alignments
    pre1, pre2 = str(tmp_path / "pre_ser"), str(tmp_path / "pre_par")
    for p in (pre1, pre2):
        sh.copytree(os.path.join(cfg.data.preprocessed_path, "TextGrid"),
                    os.path.join(p, "TextGrid"))

    cfg2 = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, preprocessed_path=pre2))
    train, val = Preprocessor(cfg2).build_from_path(workers=2)
    assert len(train) + len(val) == 3

    cfg1 = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, preprocessed_path=pre1))
    Preprocessor(cfg1).build_from_path(workers=1)

    s1 = json.load(open(os.path.join(pre1, "stats.json")))
    s2 = json.load(open(os.path.join(pre2, "stats.json")))
    assert s1 == s2
    for kind in ("mel", "duration", "mel2ph", "energy", "f0"):
        for name in sorted(os.listdir(os.path.join(pre1, kind))):
            a = np.load(os.path.join(pre1, kind, name))
            b = np.load(os.path.join(pre2, kind, name))
            np.testing.assert_array_equal(a, b, err_msg=f"{kind}/{name}")
    # same utterance set (split order is shuffled, content identical)
    def keyset(p):
        rows = open(os.path.join(p, "train.txt")).read().splitlines() + \
            open(os.path.join(p, "val.txt")).read().splitlines()
        return sorted(rows)
    assert keyset(pre1) == keyset(pre2)

"""Corpus preparers: LJSpeech / VCTK / LibriTTS layouts + kv-logger sinks."""

import dataclasses
import json
import os

import numpy as np
import pytest

from cmtts_tpu.audio.wavio import read_wav, write_wav
from cmtts_tpu.data.prepare import (
    prepare_libritts,
    prepare_ljspeech,
    prepare_vctk,
)

from helpers import tiny_config

SR = 22050


def _tone(dur=0.4, sr=SR):
    t = np.arange(int(sr * dur)) / sr
    return (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def _cfg(corpus, raw):
    cfg = tiny_config()
    return dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, corpus_path=str(corpus), raw_path=str(raw)))


def test_prepare_ljspeech(tmp_path):
    corpus = tmp_path / "LJ"
    (corpus / "wavs").mkdir(parents=True)
    write_wav(str(corpus / "wavs" / "LJ001-0001.wav"), _tone(), SR)
    (corpus / "metadata.csv").write_text(
        "LJ001-0001|Printing|Printing, in the year 1876|\n")
    raw = tmp_path / "raw"
    prepare_ljspeech(_cfg(corpus, raw))
    wav, sr = read_wav(str(raw / "LJSpeech" / "LJ001-0001.wav"))
    assert sr == SR and len(wav) > 0
    lab = (raw / "LJSpeech" / "LJ001-0001.lab").read_text()
    assert "eighteen seventy-six" in lab or "1876" not in lab  # numbers expanded


def test_prepare_vctk(tmp_path):
    corpus = tmp_path / "VCTK"
    (corpus / "txt" / "p225").mkdir(parents=True)
    (corpus / "wav48_silence_trimmed" / "p225").mkdir(parents=True)
    (corpus / "txt" / "p225" / "p225_001.txt").write_text("Please call Stella.\n")
    write_wav(str(corpus / "wav48_silence_trimmed" / "p225" /
                  "p225_001_mic1.wav"), _tone(sr=48000), 48000)
    raw = tmp_path / "raw"
    prepare_vctk(_cfg(corpus, raw))
    wav, sr = read_wav(str(raw / "p225" / "p225_001.wav"))
    assert sr == SR
    assert abs(len(wav) - int(0.4 * SR)) < 5  # resampled 48k -> 22.05k


def test_prepare_libritts(tmp_path):
    corpus = tmp_path / "LibriTTS"
    ch = corpus / "19" / "198"
    ch.mkdir(parents=True)
    write_wav(str(ch / "19_198_000000_000000.wav"), _tone(sr=24000), 24000)
    (ch / "19_198_000000_000000.normalized.txt").write_text("Hello there.\n")
    raw = tmp_path / "raw"
    prepare_libritts(_cfg(corpus, raw))
    assert (raw / "19" / "19_198_000000_000000.wav").exists()
    assert (raw / "19" / "19_198_000000_000000.lab").read_text() == "hello there."


def test_kvlogger_sinks(tmp_path):
    from cmtts_tpu.train.kvlogger import KVLogger

    log = KVLogger(str(tmp_path), formats=["csv", "jsonl"])
    log.logkv("step", 1)
    log.logkv_mean("loss", 2.0)
    log.logkv_mean("loss", 4.0)  # mean -> 3.0
    with log.profile("io"):
        pass
    log.dumpkvs()
    log.logkv("step", 2)
    log.logkv("loss", 1.0)
    log.logkv("new_key", 7.0)  # header extension path
    log.dumpkvs()
    log.close()

    csv_lines = (tmp_path / "progress.csv").read_text().strip().splitlines()
    assert "loss" in csv_lines[0] and "new_key" in csv_lines[0]
    assert len(csv_lines) == 3
    rows = [json.loads(line)
            for line in (tmp_path / "progress.jsonl").read_text().splitlines()]
    assert rows[0]["loss"] == 3.0
    assert any(k.startswith("wait_io") for k in rows[0])
    assert rows[1]["new_key"] == 7.0

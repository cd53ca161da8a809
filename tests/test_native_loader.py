"""Native C++ npy loader: correctness, dataset bulk-load equivalence,
prefetch iterator."""

import os

import numpy as np
import pytest

from cmtts_tpu.data.native_loader import (
    NativeNpyLoader,
    native_available,
    prefetch_iterator,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native featloader not built")


def test_roundtrip_various_dtypes(tmp_path):
    arrays = [
        np.random.RandomState(0).randn(100, 80).astype(np.float32),
        np.arange(50, dtype=np.int32),
        np.random.RandomState(1).randn(7, 3, 2),
        np.asarray(3.25, dtype=np.float32).reshape(()),
        np.random.RandomState(2).randint(0, 9, (64,), dtype=np.int64),
        np.asarray([1, -2, 3], dtype=np.int16),
    ]
    paths = []
    for i, a in enumerate(arrays):
        p = str(tmp_path / f"a{i}.npy")
        np.save(p, a)
        paths.append(p)
    loader = NativeNpyLoader(4)
    out = loader.load(paths)
    for a, b in zip(arrays, out):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)
    loader.close()


def test_missing_file_raises(tmp_path):
    loader = NativeNpyLoader(2)
    with pytest.raises(IOError):
        loader.load([str(tmp_path / "nope.npy")])
    loader.close()


def test_dataset_get_many_matches_getitem(tmp_path):
    """Bulk native load must assemble identical samples to __getitem__."""
    import json

    from cmtts_tpu.data.dataset import FeatureDataset
    from helpers import tiny_config

    import dataclasses
    cfg = tiny_config(n_mels=8)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, preprocessed_path=str(tmp_path)))

    rng = np.random.RandomState(0)
    lines = []
    for i in range(3):
        base, spk = f"utt{i}", "LJSpeech"
        T_mel, T_ph = 20 + i, 4
        feats = {
            "mel": rng.randn(T_mel, 8).astype(np.float32),
            "pitch": rng.randint(1, 255, T_mel).astype(np.int64),
            "f0": (rng.rand(T_mel) * 200).astype(np.float64),
            "energy": rng.rand(T_ph).astype(np.float32),
            "duration": np.full(T_ph, T_mel // T_ph, np.int64),
            "mel2ph": rng.randint(1, T_ph + 1, T_mel).astype(np.int64),
            "cwt_spec": rng.randn(T_mel, 10).astype(np.float32),
            "f0cwt_mean_std": np.asarray([5.0, 0.4]),
        }
        for kind, arr in feats.items():
            os.makedirs(tmp_path / kind, exist_ok=True)
            np.save(str(tmp_path / kind / f"{spk}-{kind}-{base}.npy"), arr)
        lines.append(f"{base}|{spk}|{{HH AH0 L OW1}}|hello")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "speakers.json").write_text(json.dumps({"LJSpeech": 0}))

    ds = FeatureDataset("train.txt", cfg)
    serial = [ds[i] for i in range(3)]
    bulk = ds.get_many([0, 1, 2])
    for a, b in zip(serial, bulk):
        assert a.keys() == b.keys()
        for k in a:
            if isinstance(a[k], np.ndarray):
                np.testing.assert_array_equal(a[k], b[k])
            else:
                assert a[k] == b[k]


def test_prefetch_iterator_order():
    def make():
        return iter(range(10))

    assert list(prefetch_iterator(make, depth=3)) == list(range(10))

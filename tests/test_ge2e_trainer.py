"""GE2E trainer: loss decreases on a separable toy speaker set."""

import os

import numpy as np
import pytest

from cmtts_tpu.train.ge2e_trainer import (
    GE2ETrainConfig,
    SpeakerVerificationDataset,
    init_ge2e_train,
    make_ge2e_train_step,
)


@pytest.fixture(scope="module")
def toy_partials(tmp_path_factory):
    root = tmp_path_factory.mktemp("partials")
    rng = np.random.RandomState(0)
    for s in range(4):
        d = root / f"spk{s}"
        d.mkdir()
        base = rng.rand(160, 40).astype(np.float32) * (s + 1)
        for u in range(6):
            part = base + 0.05 * rng.rand(160, 40).astype(np.float32)
            np.save(str(d / f"utt{u}.npy"), part)
    return str(root)


def test_ge2e_training_reduces_loss(toy_partials):
    import jax.numpy as jnp

    ds = SpeakerVerificationDataset(toy_partials)
    assert len(ds.speakers) == 4
    cfg = GE2ETrainConfig(speakers_per_batch=4, utterances_per_speaker=4,
                          learning_rate=3e-3)
    model, params, tx, opt_state = init_ge2e_train(0, cfg.learning_rate)
    step_fn = make_ge2e_train_step(model, tx, 4, 4, cfg)
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(15):
        mels, _, _ = ds.sample_batch(rng, 4, 4)
        params, opt_state, loss, gnorm = step_fn(params, opt_state,
                                                 jnp.asarray(mels))
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_val_split_and_eer(toy_partials):
    from cmtts_tpu.train.ge2e_trainer import (ge2e_verification_eer,
                                              train_ge2e)

    # val carve-out: last speaker excluded from training batches
    params = train_ge2e(toy_partials, out_dir=None, total_steps=4,
                        cfg=GE2ETrainConfig(speakers_per_batch=3,
                                            utterances_per_speaker=3),
                        val_speakers=1, eval_every=2, patience=10)
    model, init_params, _, _ = init_ge2e_train(0)
    all_ds = SpeakerVerificationDataset(toy_partials)
    eer = ge2e_verification_eer(model, params, all_ds, max_per_speaker=4)
    assert 0.0 <= eer <= 1.0
    # a perfectly separable embedding scores EER 0
    class FakeModel:
        def apply(self, _, mels):
            # one-hot by the per-speaker scale baked into the toy data
            lvl = np.asarray(mels).mean(axis=(1, 2))
            idx = np.clip(np.round(lvl / lvl.min()).astype(int) - 1, 0, 3)
            return np.eye(4, dtype=np.float32)[idx]
    assert ge2e_verification_eer(FakeModel(), {"encoder": None}, all_ds,
                                 max_per_speaker=4) == 0.0

    with pytest.raises(ValueError):
        train_ge2e(toy_partials, None, total_steps=1, val_speakers=3)


def test_prepare_from_wavs(tmp_path):
    from cmtts_tpu.audio.wavio import write_wav

    wavs = tmp_path / "wavs"
    (wavs / "spkA").mkdir(parents=True)
    sr = 22050
    t = np.arange(sr * 4) / sr
    write_wav(str(wavs / "spkA" / "a.wav"),
              (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)
    out = tmp_path / "parts"
    n = SpeakerVerificationDataset.prepare_from_wavs(str(wavs), str(out))
    assert n >= 2
    files = os.listdir(out / "spkA")
    first = np.load(str(out / "spkA" / files[0]))
    assert first.shape == (160, 40)

"""Speaker embedders: GE2E golden parity vs the reference torch encoder,
DeepSpeaker ResCNN shape/norm checks, partial-slice logic parity."""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.models.speaker import (
    DeepSpeakerResCNN,
    GE2EEncoder,
    GE2EInference,
    compute_partial_slices,
    convert_torch_ge2e,
    ds_fbank_frames,
    ds_sample_frames,
    ge2e_loss,
    ge2e_mel_frames,
    ge2e_similarity_matrix,
)

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "ge2e_encoder"))


@pytest.fixture(scope="module")
def torch_ge2e():
    if not HAS_REF:
        pytest.skip("reference snapshot not mounted")
    import torch

    pkg = types.ModuleType("ge2e_encoder")
    pkg.__path__ = [os.path.join(REF, "ge2e_encoder")]
    sys.modules.setdefault("ge2e_encoder", pkg)
    sys.path.insert(0, REF)
    try:
        from ge2e_encoder.model import SpeakerEncoder
    finally:
        sys.path.remove(REF)
    torch.manual_seed(0)
    return SpeakerEncoder(torch.device("cpu"), torch.device("cpu")).eval()


def test_ge2e_embedding_parity(torch_ge2e):
    import torch

    sd = {k: v.numpy() for k, v in torch_ge2e.state_dict().items()}
    params = convert_torch_ge2e(sd)
    mels = np.random.RandomState(0).rand(3, 160, 40).astype(np.float32)
    with torch.no_grad():
        ref = torch_ge2e(torch.from_numpy(mels)).numpy()
    ours = GE2EEncoder().apply({"params": params}, jnp.asarray(mels))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_ge2e_loss_parity(torch_ge2e, monkeypatch):
    import torch

    # the reference uses the np.int alias removed in modern numpy
    monkeypatch.setattr(np, "int", int, raising=False)
    S, U, E = 4, 5, 256
    embeds = np.random.RandomState(1).randn(S, U, E).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=2, keepdims=True)
    with torch.no_grad():
        sim_ref = torch_ge2e.similarity_matrix(torch.from_numpy(embeds)).numpy()
        loss_ref, _eer = torch_ge2e.loss(torch.from_numpy(embeds))
    sim = ge2e_similarity_matrix(jnp.asarray(embeds), 10.0, -5.0)
    np.testing.assert_allclose(np.asarray(sim), sim_ref, rtol=1e-4, atol=1e-4)
    loss = ge2e_loss(jnp.asarray(embeds), 10.0, -5.0)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


def test_partial_slices_match_reference_logic():
    # reimplementation of ge2e_encoder/inference.py:58-108 invariants
    for n_samples in (22050, 60000, 9000, 300000):
        wav_slices, mel_slices = compute_partial_slices(n_samples)
        assert len(wav_slices) == len(mel_slices) >= 1
        spf = int(22050 * 10 / 1000)
        for ws, ms in zip(wav_slices, mel_slices):
            assert ms.stop - ms.start == 160
            assert ws.start == ms.start * spf and ws.stop == ms.stop * spf
        # consecutive windows overlap by ~50%
        if len(mel_slices) > 1:
            assert mel_slices[1].start - mel_slices[0].start == 80


def test_ge2e_inference_embed_utterance():
    model = GE2EEncoder()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 160, 40)))["params"]
    inf = GE2EInference(params)
    sr = 22050
    t = np.arange(sr * 2) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    emb = inf.embed_utterance(wav)
    assert emb.shape == (256,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-5)
    # deterministic
    emb2 = inf.embed_utterance(wav)
    np.testing.assert_allclose(emb, emb2)


def test_ge2e_mel_frames_shape():
    wav = np.random.RandomState(0).randn(22050).astype(np.float32) * 0.1
    frames = ge2e_mel_frames(wav)
    assert frames.shape[1] == 40
    assert frames.shape[0] >= 99
    assert (frames >= 0).all()  # power spectrogram


def test_deepspeaker_shapes_and_norm():
    model = DeepSpeakerResCNN()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 160, 64, 1),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5)


def test_ds_fbank_and_sampling():
    wav = np.random.RandomState(0).randn(22050).astype(np.float32) * 0.1
    fb = ds_fbank_frames(wav)
    assert fb.shape[1] == 64
    # normalized per utterance
    np.testing.assert_allclose(fb.mean(axis=0), 0.0, atol=1e-4)
    s = ds_sample_frames(fb, 160)
    assert s.shape == (160, 64)
    short = fb[:50]
    s2 = ds_sample_frames(short, 160)
    assert s2.shape == (160, 64)
    np.testing.assert_array_equal(s2[:50], short)

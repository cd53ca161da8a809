"""Zero-shot path: external speaker embedding through the fused pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.models.cmtts import CMTTS
from cmtts_tpu.pipeline import Synthesizer

from helpers import tiny_config


@pytest.fixture(scope="module")
def zs_setup():
    import dataclasses

    cfg = tiny_config(multi_speaker=True)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, speaker_embedder="GE2E", external_speaker_dim=8))
    model = CMTTS(cfg)
    B, T_txt, T_mel = 2, 8, 24
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((B, T_mel, cfg.stft.n_mel_channels)), jnp.zeros(B),
        speakers=jnp.zeros(B, jnp.int32),
        texts=jnp.ones((B, T_txt), jnp.int32),
        src_lens=jnp.full((B,), T_txt, jnp.int32),
        spker_embeds=jnp.zeros((B, 8)),
        deterministic=True)
    params = variables["params"]
    # the denoiser output head is zero-init (reference modules.py:598), so a
    # fresh model ignores conditioning; perturb it so speaker identity can
    # reach the mel for the sensitivity check below
    k = params["denoiser"]["out_proj"]["kernel"]
    params["denoiser"]["out_proj"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(1), k.shape, k.dtype) * 0.1)
    return cfg, params


def test_zeroshot_synthesis_with_external_embedding(zs_setup):
    cfg, params = zs_setup
    synth = Synthesizer(cfg, params, vocoder_params=None, T=1,
                        text_buckets=(8,), mel_buckets=(32,))
    tokens = [np.array([5, 6, 7, 8], np.int32), np.array([9, 10], np.int32)]
    embed = np.random.RandomState(0).randn(2, 8).astype(np.float32)
    mel, mel_lens, wav = synth(tokens, spker_embeds=embed, mel_bucket=32)
    assert mel.shape == (2, 32, cfg.stft.n_mel_channels)
    assert wav is None

    # a different speaker embedding must change the output
    mel2, _, _ = synth(tokens, spker_embeds=embed + 1.0, mel_bucket=32)
    assert np.abs(mel - mel2).max() > 1e-6


def test_zeroshot_requires_embedding(zs_setup):
    cfg, params = zs_setup
    synth = Synthesizer(cfg, params, vocoder_params=None, T=1,
                        text_buckets=(8,), mel_buckets=(32,))
    with pytest.raises(ValueError, match="spker_embeds"):
        synth([np.array([5, 6], np.int32)], mel_bucket=32)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.models.cmtts import CMTTS
from cmtts_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
from cmtts_tpu.pipeline import Synthesizer

from helpers import tiny_config


TINY_VOC = HiFiGANConfig(
    upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=8, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),), num_mels=16)


def test_hifigan_shapes():
    voc = HiFiGANGenerator(TINY_VOC)
    mel = jnp.zeros((2, 10, 16))
    params = voc.init(jax.random.PRNGKey(0), mel)["params"]
    wav = voc.apply({"params": params}, mel)
    assert wav.shape == (2, 160)  # 16x upsampling


def test_hifigan_default_hop():
    assert HiFiGANConfig().hop_length == 256


def test_synthesizer_commits_params_to_device():
    """Host-numpy param trees (what orbax restore / unflatten_npz hand
    back) must be converted to device arrays ONCE in the constructor —
    otherwise every jitted call re-uploads all weights (a 30-40x RTF
    regression through the dev TPU tunnel, found in round 4)."""
    cfg = tiny_config()
    model = CMTTS(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 16, 16)), jnp.zeros(1),
        speakers=jnp.zeros(1, jnp.int32), texts=jnp.ones((1, 8), jnp.int32),
        src_lens=jnp.asarray([8]), deterministic=True)
    host_cm = jax.tree_util.tree_map(np.asarray, variables["params"])
    voc = HiFiGANGenerator(TINY_VOC)
    host_voc = jax.tree_util.tree_map(
        np.asarray,
        voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 16)))["params"])

    synth = Synthesizer(cfg, host_cm, host_voc, T=1,
                        text_buckets=(8,), mel_buckets=(32,))
    for tree in (synth.cm_params, synth.vocoder_params):
        leaves = jax.tree_util.tree_leaves(tree)
        assert leaves and all(isinstance(x, jax.Array) for x in leaves)


@pytest.mark.slow
def test_synthesizer_end_to_end():
    cfg = tiny_config()
    model = CMTTS(cfg)
    rng = jax.random.PRNGKey(0)
    texts = jnp.ones((1, 8), jnp.int32)
    # full init (cond-net + denoiser): __call__ with a dummy mel
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 16, 16)), jnp.zeros(1),
        speakers=jnp.zeros(1, jnp.int32), texts=texts,
        src_lens=jnp.asarray([8]), deterministic=True)
    voc = HiFiGANGenerator(TINY_VOC)
    voc_params = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 16)))["params"]

    synth = Synthesizer(cfg, variables["params"], voc_params, T=1,
                        text_buckets=(8, 16), mel_buckets=(32,))
    synth.hifigan = voc  # tiny vocoder for test speed
    tokens = [np.arange(1, 7, dtype=np.int32), np.arange(1, 9, dtype=np.int32)]
    mel, mel_lens, wav = synth(tokens)
    assert mel.shape == (2, 32, 16)
    assert wav.shape == (2, 32 * 16)
    trimmed = synth.trim_wavs(wav, mel_lens)
    assert len(trimmed) == 2

    # T=2 multistep path
    synth2 = Synthesizer(cfg, variables["params"], None, T=2,
                         text_buckets=(8,), mel_buckets=(32,))
    mel2, lens2, wav2 = synth2(tokens)
    assert mel2.shape == (2, 32, 16)
    assert wav2 is None

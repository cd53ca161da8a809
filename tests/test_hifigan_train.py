"""HiFi-GAN training subsystem: discriminators, losses, fused D/G step.

Parity sources: HiFi-GAN paper (arXiv 2010.05646) section 2.4 loss
formulas; the reference repo ships only the generator
(``hifigan/models.py``), so the discriminators/trainer have no reference
counterpart to golden-test against — formulas are validated against
hand-computed numpy and the step against convergence behavior.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.models.hifigan import HiFiGANConfig, load_hifigan_params
from cmtts_tpu.models.hifigan_disc import (
    HiFiGANDiscConfig,
    HiFiGANDiscriminators,
    MultiPeriodDiscriminator,
    WNConv,
    _avg_pool1d,
    discriminator_loss,
    feature_matching_loss,
    generator_adv_loss,
)
from cmtts_tpu.train.hifigan_trainer import (
    HiFiGANTrainConfig,
    WaveSegmentSampler,
    init_hifigan_train,
    make_hifigan_train_step,
    save_hifigan,
)

TINY_DISC = HiFiGANDiscConfig(
    periods=(2, 3),
    mpd_channels=(4, 8),
    msd_channels=(8, 8, 8),
    msd_groups=(1, 4, 1),
    msd_kernels=(15, 41, 5),
    msd_strides=(1, 2, 1),
    n_scales=2,
)

TINY_GEN = HiFiGANConfig(upsample_initial_channel=32, num_mels=80)


def test_wnconv_equals_plain_conv_at_init():
    """g is initialized to ||v||, so the initial forward must equal a
    plain convolution with kernel v."""
    m = WNConv(6, (5,), (1,))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 4), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    y = m.apply({"params": params}, x)
    w = params["v"]
    ref = jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref + params["bias"]),
                               rtol=2e-5, atol=2e-5)


def test_wnconv_grouped_shapes():
    m = WNConv(8, (41,), (2,), feature_group_count=4)
    x = jnp.zeros((1, 64, 8))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert params["v"].shape == (41, 2, 8)  # in_ch/groups = 2
    assert m.apply({"params": params}, x).shape == (1, 32, 8)


def test_discriminator_output_structure():
    disc = HiFiGANDiscriminators(TINY_DISC)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 1024), jnp.float32)
    params = disc.init(jax.random.PRNGKey(0), wav)["params"]
    outs = disc.apply({"params": params}, wav)
    # 2 periods + 2 scales
    assert len(outs) == 4
    for feats, logits in outs:
        assert logits.ndim == 2 and logits.shape[0] == 2
        # final feature map IS the logit tensor (pre-flatten)
        assert feats[-1].size == logits.size
        assert len(feats) >= 3


def test_period_reshape_covers_odd_lengths():
    """Period-3 branch must reflect-pad T=1024 (not divisible by 3)."""
    pd = MultiPeriodDiscriminator(TINY_DISC)
    wav = jnp.zeros((1, 1024))
    params = pd.init(jax.random.PRNGKey(0), wav)["params"]
    outs = pd.apply({"params": params}, wav)
    assert all(np.isfinite(np.asarray(lg)).all() for _, lg in outs)


def test_avg_pool_matches_torch_semantics():
    """AvgPool1d(kernel=4, stride=2, padding=2) on a ramp."""
    x = jnp.arange(8, dtype=jnp.float32)[None]
    y = np.asarray(_avg_pool1d(x))
    # torch: pads 2 zeros each side -> windows at offsets 0,2,4,6,8
    xp = np.pad(np.arange(8, dtype=np.float32), (2, 2))
    expect = np.stack([xp[i:i + 4].mean() for i in range(0, 9, 2)])
    np.testing.assert_allclose(y[0], expect, rtol=1e-6)


def test_loss_formulas_match_numpy():
    r = np.random.RandomState(0)
    real = [([jnp.asarray(r.randn(2, 3))], jnp.asarray(r.randn(2, 5)))
            for _ in range(2)]
    fake = [([jnp.asarray(r.randn(2, 3))], jnp.asarray(r.randn(2, 5)))
            for _ in range(2)]
    d = float(discriminator_loss(real, fake))
    expect_d = sum(
        ((1 - np.asarray(dr)) ** 2).mean() + (np.asarray(df) ** 2).mean()
        for (_, dr), (_, df) in zip(real, fake))
    np.testing.assert_allclose(d, expect_d, rtol=1e-6)

    g = float(generator_adv_loss(fake))
    expect_g = sum(((1 - np.asarray(df)) ** 2).mean() for _, df in fake)
    np.testing.assert_allclose(g, expect_g, rtol=1e-6)

    fm = float(feature_matching_loss(real, fake))
    expect_fm = sum(
        np.abs(np.asarray(fr[0]) - np.asarray(ff[0])).mean()
        for (fr, _), (ff, _) in zip(real, fake))
    np.testing.assert_allclose(fm, expect_fm, rtol=1e-6)


def _tiny_corpus(tmp_path, n=3, length=6000, sr=22050):
    rng = np.random.RandomState(0)
    root = os.path.join(tmp_path, "wavs")
    os.makedirs(root, exist_ok=True)
    from cmtts_tpu.audio.wavio import write_wav

    for i in range(n):
        t = np.arange(length) / sr
        wav = 0.4 * np.sin(2 * np.pi * (120 + 40 * i) * t) \
            + 0.05 * rng.randn(length)
        write_wav(os.path.join(root, f"u{i}.wav"), wav.astype(np.float32), sr)
    return root


def test_segment_sampler(tmp_path):
    root = _tiny_corpus(str(tmp_path))
    s = WaveSegmentSampler(root, 2048)
    batch = s.sample(np.random.RandomState(0), 4)
    assert batch.shape == (4, 2048) and batch.dtype == np.float32
    # short-file tiling path
    s2 = WaveSegmentSampler(root, 8192)
    b2 = s2.sample(np.random.RandomState(0), 2)
    assert b2.shape == (2, 8192)


def test_train_step_reduces_mel_loss(tmp_path):
    """A few fused D/G steps on a tiny model must run finitely and move
    the mel reconstruction down from the random-init level."""
    cfg = HiFiGANTrainConfig(segment_size=2048, batch_size=2,
                             learning_rate=5e-4)
    state, gen, disc = init_hifigan_train(cfg, TINY_GEN, TINY_DISC)
    from cmtts_tpu.audio.stft import MelSpectrogram

    stft = MelSpectrogram()
    step_fn = make_hifigan_train_step(gen, disc, stft, cfg)
    root = _tiny_corpus(str(tmp_path))
    sampler = WaveSegmentSampler(root, cfg.segment_size)
    rng = np.random.RandomState(0)
    mel_hist = []
    for _ in range(12):
        wavs = sampler.sample(rng, cfg.batch_size)
        state, metrics = step_fn(state, jnp.asarray(wavs))
        m = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), m
        mel_hist.append(m["mel_l1"])
    assert int(state["step"]) == 12
    assert min(mel_hist[-4:]) < mel_hist[0], mel_hist


def test_generator_npz_roundtrip(tmp_path):
    """The exported npz loads through load_hifigan_params and reproduces
    the trainer generator's forward exactly."""
    cfg = HiFiGANTrainConfig(segment_size=2048, batch_size=2)
    state, gen, _ = init_hifigan_train(cfg, TINY_GEN, TINY_DISC)
    path = save_hifigan(state, str(tmp_path), 7)
    params = load_hifigan_params(path)
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 8, 80), jnp.float32)
    a = gen.apply({"params": state["gen"]}, mel)
    b = gen.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  mel)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # resume pickle exists
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "hifigan_train_state.npy"))


def test_jax_platforms_env_contract():
    """`JAX_PLATFORMS=cpu python ...` must actually select CPU even
    though the container's sitecustomize boot hook force-registers the
    TPU-tunnel platform — cmtts_tpu/__init__.py re-asserts the env var.
    Without the guard this subprocess hangs/fails on a dead tunnel."""
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "import cmtts_tpu, jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("cpu"), out.stdout


def test_paired_finetune_sampler_and_step(tmp_path):
    """Fine-tune mode: externally supplied mels drive G's input, the mel
    loss targets the ground-truth waveform's mel."""
    from cmtts_tpu.audio.stft import MelSpectrogram
    from cmtts_tpu.audio.wavio import write_wav
    from cmtts_tpu.train.hifigan_trainer import MelWavPairSampler

    sr, hop = 22050, 256
    stft = MelSpectrogram()
    wav_root = os.path.join(str(tmp_path), "wavs")
    mel_dir = os.path.join(str(tmp_path), "mels")
    os.makedirs(wav_root), os.makedirs(mel_dir)
    rng = np.random.RandomState(0)
    for i in range(3):
        frames = 24 + i
        wav = 0.3 * np.sin(2 * np.pi * 150 * np.arange(frames * hop) / sr)
        write_wav(os.path.join(wav_root, f"u{i}.wav"),
                  wav.astype(np.float32), sr)
        # "predicted" mel = GT mel + noise, preprocessor naming
        mel, _ = stft(wav.astype(np.float32))
        np.save(os.path.join(mel_dir, f"SPK-mel-u{i}.npy"),
                mel[:, :frames].T + 0.1 * rng.randn(frames, 80))
    # a misaligned decoy must be skipped, not crash
    np.save(os.path.join(mel_dir, "SPK-mel-u0_bad.npy"),
            np.zeros((500, 80), np.float32))

    F = 8
    with pytest.warns(UserWarning, match="unmatched"):
        sampler = MelWavPairSampler(mel_dir, wav_root, F, hop, sr)
    assert len(sampler.pairs) == 3
    wavs, mels = sampler.sample(np.random.RandomState(1), 2)
    assert wavs.shape == (2, F * hop) and mels.shape == (2, F, 80)

    cfg = HiFiGANTrainConfig(segment_size=F * hop, batch_size=2)
    state, gen, disc = init_hifigan_train(cfg, TINY_GEN, TINY_DISC)
    step_fn = make_hifigan_train_step(gen, disc, stft, cfg, paired=True)
    state, metrics = step_fn(state, jnp.asarray(wavs), jnp.asarray(mels))
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_synthesizer_infers_generator_width():
    """A non-512-width trained generator must synthesize without a
    config override (width read from conv_pre) and route to the
    pure-XLA vocoder path."""
    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.pipeline import Synthesizer
    from tests.helpers import tiny_config

    tts_cfg = tiny_config()
    model = CMTTS(tts_cfg)
    rng = jax.random.PRNGKey(0)
    texts = jnp.ones((1, 8), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 16, 16)), jnp.zeros(1),
        speakers=jnp.zeros(1, jnp.int32), texts=texts,
        src_lens=jnp.asarray([8]), deterministic=True)

    n_mels = tts_cfg.stft.n_mel_channels
    voc_cfg = HiFiGANConfig(upsample_initial_channel=64, num_mels=n_mels)
    from cmtts_tpu.models.hifigan import HiFiGANGenerator

    voc = HiFiGANGenerator(voc_cfg)
    voc_params = voc.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8, n_mels)))["params"]
    synth = Synthesizer(tts_cfg, variables["params"], voc_params, T=1,
                        text_buckets=(8,), mel_buckets=(32,))
    assert synth.hifigan.cfg.upsample_initial_channel == 64
    tokens = [np.arange(1, 9, dtype=np.int32)]
    mel, mel_lens, wav = synth(tokens)
    assert wav is not None and wav.shape == (1, 32 * 256)
    assert np.isfinite(np.asarray(wav)).all()

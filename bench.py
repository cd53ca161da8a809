"""End-to-end synthesis benchmark: RTF at T=1 on one chip.

Flagship LJSpeech-config CM-TTS + HiFi-GAN, fused text->mel->wav pipeline
(one XLA graph), batch 8, ~real sentence lengths.  Metric = RTF
(synthesis wall-clock / generated audio seconds), the reference's
``p_rtf_cm.py`` definition (:174-230); north-star RTF <= 0.01
(BASELINE.md).  Prints one JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from cmtts_tpu.pipeline import Synthesizer

    cfg = load_configs("LJSpeech")
    model = CMTTS(cfg)
    rng = jax.random.PRNGKey(0)

    B, T_TXT = 8, 96
    tokens = [np.random.RandomState(i).randint(13, 140, T_TXT).astype(np.int32)
              for i in range(B)]

    # full init (cond-net + denoiser) via the training forward
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((B, 128, cfg.stft.n_mel_channels)), jnp.zeros(B),
        speakers=jnp.zeros(B, jnp.int32),
        texts=jnp.asarray(np.stack(tokens)),
        src_lens=jnp.full((B,), T_TXT, jnp.int32),
        deterministic=True)
    params = variables["params"]
    # random init predicts ~0 duration; bias the duration head to ~6
    # frames/phoneme so the benchmark synthesizes realistic lengths
    params["variance_adaptor"]["duration_predictor"]["proj"]["bias"] = (
        jnp.full_like(
            params["variance_adaptor"]["duration_predictor"]["proj"]["bias"],
            float(np.log(7.0))))

    voc = HiFiGANGenerator(HiFiGANConfig())
    voc_params = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80)))["params"]

    synth = Synthesizer(cfg, params, voc_params, T=1)
    mel_bucket = 768

    # warmup / compile
    mel, mel_lens, wav = synth(tokens, mel_bucket=mel_bucket)
    jax.block_until_ready(wav)

    n_iters = 10
    t0 = time.perf_counter()
    total_audio_sec = 0.0
    total_frames = 0
    for i in range(n_iters):
        mel, mel_lens, wav = synth(tokens, seed=i, mel_bucket=mel_bucket)
    jax.block_until_ready(wav)
    elapsed = time.perf_counter() - t0

    total_frames = int(mel_lens.sum()) * n_iters
    total_audio_sec = total_frames * cfg.stft.hop_length / cfg.stft.sampling_rate
    rtf = elapsed / total_audio_sec
    frames_per_sec = total_frames / elapsed

    print(json.dumps({
        "metric": "rtf_T1",
        "value": rtf,
        "unit": "wallclock/audio_sec",
        "vs_baseline": 0.01 / rtf,
        "extra": {
            "mel_frames_per_sec_per_chip": frames_per_sec,
            "batch": B,
            "audio_sec_per_iter": total_audio_sec / n_iters,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

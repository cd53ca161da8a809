"""RTF benchmark CLI (reference ``p_rtf_cm.py`` surface).

RTF = synthesis wall-clock / generated audio seconds, measured per batch
after compile warmup (the reference's Timer starts after the cond-net
forward and stops after the first wav write, :174-230; here the fused
pipeline makes the whole text->wav graph the timed unit, which is the
honest production number).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--source", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--T", type=int, default=1, choices=[1, 2, 4])
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--config_root", type=str, default=None)
    parser.add_argument("--vocoder_ckpt", type=str, default=None)
    parser.add_argument("--write_wavs", action="store_true")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    import jax
    from cmtts_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    from cmtts_tpu.audio.wavio import write_wav
    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.data.dataset import TextMetaDataset
    from cmtts_tpu.models.hifigan import load_hifigan_params
    from cmtts_tpu.pipeline import Synthesizer
    from cmtts_tpu.train.checkpoint import restore_checkpoint

    cfg = load_configs(args.dataset, args.config_root)
    payload = restore_checkpoint(cfg.train.ckpt_path, args.restore_step or None)
    voc_params = load_hifigan_params(args.vocoder_ckpt, cfg)
    synth = Synthesizer(cfg, payload["model"], voc_params, T=args.T,
                        vocoder_name=cfg.model.vocoder_model)

    dataset = TextMetaDataset(args.source, cfg)
    batches = list(dataset.batches(args.batch_size))

    # warmup on the first batch of each bucket
    b0 = batches[0]
    _, _, wav = synth(b0["tokens"], speakers=b0["speakers"],
                      spker_embeds=b0["spker_embeds"])
    jax.block_until_ready(wav)

    rtf_list = []
    total_audio, total_wall = 0.0, 0.0
    out_dir = args.out or "./rtf_out"
    os.makedirs(out_dir, exist_ok=True)
    for bi, batch in enumerate(batches):
        t0 = time.perf_counter()
        mel, mel_lens, wav = synth(batch["tokens"], speakers=batch["speakers"],
                                   spker_embeds=batch["spker_embeds"])
        jax.block_until_ready(wav)
        wavs = synth.trim_wavs(wav, mel_lens)
        if args.write_wavs:
            for w, basename in zip(wavs, batch["ids"]):
                write_wav(os.path.join(out_dir, f"{basename}.wav"), w,
                          cfg.stft.sampling_rate)
        elapsed = time.perf_counter() - t0
        audio_sec = sum(len(w) for w in wavs) / cfg.stft.sampling_rate
        if audio_sec > 0:
            rtf_list.append(elapsed / audio_sec)
            total_audio += audio_sec
            total_wall += elapsed

    mean_rtf = total_wall / max(total_audio, 1e-9)
    result = {
        "T": args.T,
        "batches": len(batches),
        "mean_rtf": mean_rtf,
        "per_batch_rtf_mean": float(np.mean(rtf_list)) if rtf_list else None,
        "audio_seconds": total_audio,
    }
    print(json.dumps(result))
    with open(os.path.join(out_dir, f"rtf_{mean_rtf:.6f}.json"), "w") as f:
        json.dump({"rtf_list": rtf_list, **result}, f)


if __name__ == "__main__":
    main()

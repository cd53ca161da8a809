"""Zero-shot synthesis: condition a multi-speaker model on an unseen
speaker (reference ``synthesize_zeroshot_lj.py`` / ``_vctk.py`` surface,
unified).

Two ways to provide the target voice:
  --ref_wav path.wav      embed on the fly (the reference's
                          ``get_deep_speaker_emb`` path — that symbol is
                          missing from the snapshot, supplied in
                          cmtts_tpu.models.speaker)
  --spker_embed path.npy  precomputed embedding (the reference's VCTK
                          zero-shot path, batch_size=1,
                          synthesize_zeroshot_vctk.py:385-391)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from cmtts_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--mode", type=str, choices=["batch", "single"],
                        default="single")
    parser.add_argument("--source", type=str, default=None)
    parser.add_argument("--text", type=str, default=None)
    parser.add_argument("--dataset", type=str, required=True,
                        help="dataset the model was trained on (e.g. LibriTTS)")
    parser.add_argument("--T", type=int, default=1, choices=[1, 2, 4])
    parser.add_argument("--config_root", type=str, default=None)
    parser.add_argument("--ref_wav", type=str, default=None,
                        help="reference wav of the target speaker")
    parser.add_argument("--spker_embed", type=str, default=None,
                        help="precomputed speaker-embedding .npy")
    parser.add_argument("--embedder_ckpt", type=str, default=None)
    parser.add_argument("--vocoder_ckpt", type=str, default=None)
    parser.add_argument("--vocoder", type=str, default=None,
                        choices=["hifigan", "melgan", "griffinlim", "none"],
                        help="override the config vocoder; defaults to "
                             "griffinlim when no --vocoder_ckpt is given "
                             "(a random-init neural vocoder would emit "
                             "meaningless buzz)")
    parser.add_argument("--tag", type=str, default="zeroshot")
    parser.add_argument("--pitch_control", type=float, default=1.0)
    parser.add_argument("--energy_control", type=float, default=1.0)
    parser.add_argument("--duration_control", type=float, default=1.0)
    args = parser.parse_args()
    if (args.ref_wav is None) == (args.spker_embed is None):
        parser.error("exactly one of --ref_wav / --spker_embed is required")

    from cmtts_tpu.audio.wavio import read_wav, write_wav
    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.data.dataset import TextMetaDataset
    from cmtts_tpu.models.hifigan import load_hifigan_params
    from cmtts_tpu.pipeline import Synthesizer
    from cmtts_tpu.train.checkpoint import restore_checkpoint

    cfg = load_configs(args.dataset, args.config_root)
    if not cfg.model.multi_speaker or cfg.model.speaker_embedder == "none":
        raise SystemExit("zero-shot requires a multi-speaker model trained "
                         "with an external speaker embedder")

    if args.spker_embed:
        embed = np.load(args.spker_embed).astype(np.float32).reshape(-1)
    else:
        from cmtts_tpu.models.speaker import get_deep_speaker_emb

        wav, sr = read_wav(args.ref_wav)
        embed = np.asarray(
            get_deep_speaker_emb(wav, cfg, args.embedder_ckpt), np.float32)
    if embed.shape[0] != cfg.model.external_speaker_dim:
        raise SystemExit(
            f"embedding dim {embed.shape[0]} != external_speaker_dim "
            f"{cfg.model.external_speaker_dim}")

    # adopt the checkpoint run's graph-affecting flags (ADVICE r4): a
    # maskstd-trained checkpoint must be synthesized with the same
    # inverse-CWT standardization
    from cmtts_tpu.train.checkpoint import read_run_config
    run_cfg = read_run_config(cfg.train.ckpt_path)
    if run_cfg.get("cwt_masked_std") and not cfg.pitch.cwt_masked_std:
        import dataclasses

        print("==> checkpoint was trained with --cwt_masked_std; adopting")
        cfg = dataclasses.replace(cfg, pitch=dataclasses.replace(
            cfg.pitch, cwt_masked_std=True))

    payload = restore_checkpoint(cfg.train.ckpt_path, args.restore_step or None)

    vocoder = args.vocoder
    if vocoder is None and args.vocoder_ckpt is None:
        # unlike cli/synthesize.py (where quality runbooks always pass an
        # explicit vocoder), default zero-shot to Griffin-Lim rather than
        # silently vocoding with a random-init HiFi-GAN
        print("== no --vocoder_ckpt: vocoding with Griffin-Lim "
              "(pass --vocoder hifigan --vocoder_ckpt ... for neural) ==")
        vocoder = "griffinlim"
    if vocoder in ("hifigan", "melgan") and args.vocoder_ckpt is None:
        # an EXPLICIT neural-vocoder request without weights would fall
        # through load_hifigan_params(None) to a random-init generator —
        # the buzz-output failure mode round 4 fixed for the default path
        raise SystemExit(f"--vocoder {vocoder} requires --vocoder_ckpt "
                         "(no checkpoint means random-init output); drop "
                         "--vocoder for Griffin-Lim instead")
    if vocoder in ("hifigan", "melgan"):
        import dataclasses

        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model,
            vocoder_model={"hifigan": "HiFi-GAN",
                           "melgan": "MelGAN"}[vocoder]))
    griffin = None
    if vocoder in ("griffinlim", "none"):
        voc_params = None
        if vocoder == "griffinlim":
            from cmtts_tpu.audio.stft import GriffinLim, MelSpectrogram

            griffin = GriffinLim(MelSpectrogram(
                cfg.stft.sampling_rate, cfg.stft.filter_length,
                cfg.stft.hop_length, cfg.stft.win_length,
                cfg.stft.n_mel_channels, cfg.stft.mel_fmin,
                cfg.stft.mel_fmax))
    else:
        voc_params = load_hifigan_params(args.vocoder_ckpt, cfg)
    synth = Synthesizer(cfg, payload["model"], voc_params, T=args.T,
                        vocoder_name=cfg.model.vocoder_model)

    out_dir = os.path.join(cfg.train.result_path + "_cm",
                           f"step_{args.restore_step}_T{args.T}_{args.tag}")
    os.makedirs(out_dir, exist_ok=True)

    def run(ids, tokens):
        B = len(tokens)
        mel, mel_lens, wav = synth(
            tokens, speakers=np.zeros(B, np.int32),
            spker_embeds=np.tile(embed[None], (B, 1)),
            d_control=args.duration_control, p_control=args.pitch_control,
            e_control=args.energy_control)
        for i, basename in enumerate(ids):
            np.save(os.path.join(out_dir, f"{basename}-mel.npy"),
                    mel[i, : int(mel_lens[i])])
        if wav is not None:
            for w, basename in zip(synth.trim_wavs(wav, mel_lens), ids):
                write_wav(os.path.join(out_dir, f"{basename}.wav"), w,
                          cfg.stft.sampling_rate)
        elif griffin is not None:
            for i, basename in enumerate(ids):
                w = griffin(mel[i, : int(mel_lens[i])])
                write_wav(os.path.join(out_dir, f"{basename}.wav"), w,
                          cfg.stft.sampling_rate)
        print(f"synthesized {len(ids)} -> {out_dir}")

    if args.mode == "batch":
        dataset = TextMetaDataset(args.source, cfg)
        # the reference zero-shot scripts run batch_size=1
        for batch in dataset.batches(1):
            run(batch["ids"], batch["tokens"])
    else:
        from cli.synthesize import preprocess_english

        tokens = preprocess_english(
            args.text, cfg.data.lexicon_path, list(cfg.data.text_cleaners))
        run(["zeroshot_single"], [tokens])


if __name__ == "__main__":
    main()

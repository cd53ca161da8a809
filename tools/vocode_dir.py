"""Vocode a directory of mel npys with a trained HiFi-GAN npz (or
Griffin-Lim for A/B): the vocoder-isolation half of the quality loop —
same mels, different vocoder, so metric deltas are attributable to the
vocoder alone.

    python tools/vocode_dir.py --mel_dir <dir with *-mel.npy / *-mel-*.npy> \
        --ckpt out/hifigan/hifigan_gen_00010000.npz --out <wav dir>
    python tools/vocode_dir.py --mel_dir ... --griffinlim --out ...

Mels are ln-compressed (the front-end contract, audio/stft.py); shapes
(frames, 80) or (80, frames) both accepted.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mel_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", default=None, help="hifigan generator npz/pt")
    ap.add_argument("--griffinlim", action="store_true")
    ap.add_argument("--n_mels", type=int, default=80)
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--hop", type=int, default=256)
    args = ap.parse_args()
    if (args.ckpt is None) == (not args.griffinlim):
        ap.error("exactly one of --ckpt / --griffinlim")

    import jax.numpy as jnp

    from cmtts_tpu.audio.wavio import write_wav
    from cmtts_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    os.makedirs(args.out, exist_ok=True)

    if args.griffinlim:
        from cmtts_tpu.audio.stft import GriffinLim, MelSpectrogram

        gl = GriffinLim(MelSpectrogram(sampling_rate=args.sr,
                                       n_mel_channels=args.n_mels))
        vocode = lambda mel: np.asarray(gl(jnp.asarray(mel)))
    else:
        import jax

        from cmtts_tpu.models.hifigan import (HiFiGANConfig,
                                              HiFiGANGenerator,
                                              load_hifigan_params)

        params = load_hifigan_params(args.ckpt)
        width = int(np.asarray(params["conv_pre"]["kernel"]).shape[-1])
        gen = HiFiGANGenerator(HiFiGANConfig(
            num_mels=args.n_mels, sampling_rate=args.sr,
            upsample_initial_channel=width))
        params = jax.tree_util.tree_map(jnp.asarray, params)
        apply = jax.jit(lambda m: gen.apply({"params": params}, m))
        hop = args.hop  # front-end contract (audio/stft.py)

        def vocode(mel):
            # pad frames up to a multiple of 64 so the jit (and the
            # persistent XLA cache across invocations) sees a handful of
            # shapes instead of one per utterance — each unique shape is
            # a multi-minute compile through the dev tunnel. Pad with
            # the ln-mel silence floor; output trimmed to the true
            # length (conv edge effects die within the receptive field).
            t = mel.shape[0]
            t_pad = -(-t // 64) * 64
            if t_pad != t:
                mel = np.pad(mel, ((0, t_pad - t), (0, 0)),
                             constant_values=float(np.log(1e-5)))
            wav = np.asarray(apply(jnp.asarray(mel)[None]))[0]
            return wav[: t * hop]

    n = 0
    for name in sorted(os.listdir(args.mel_dir)):
        if not name.endswith(".npy") or "mel" not in name:
            continue
        mel = np.load(os.path.join(args.mel_dir, name)).astype(np.float32)
        if mel.ndim != 2:
            continue
        if mel.shape[0] == args.n_mels and mel.shape[1] != args.n_mels:
            mel = mel.T
        stem = name[:-4]
        if "-mel-" in stem:
            base = stem.split("-mel-", 1)[1]
        elif stem.endswith("-mel"):
            base = stem[:-4]
        else:
            base = stem
        wav = vocode(mel)
        write_wav(os.path.join(args.out, base + ".wav"), wav, args.sr)
        n += 1
    print(f"vocoded {n} mels -> {args.out}")


if __name__ == "__main__":
    main()

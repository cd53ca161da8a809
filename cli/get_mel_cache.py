"""Precompute mel npy caches of synthesized wavs for metric runs
(reference ``get_mel_cache.py:25-50``, built on the missing ``audio``
package — here on cmtts_tpu.audio.stft)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--sampling_rate", type=int, default=22050)
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from cmtts_tpu.audio.stft import MelSpectrogram
    from cmtts_tpu.metrics.features import load_wav

    stft = MelSpectrogram(sampling_rate=args.sampling_rate)
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(args.wav_dir)):
        if not name.endswith(".wav"):
            continue
        wav = load_wav(os.path.join(args.wav_dir, name), args.sampling_rate)
        mel, _energy = stft(wav)
        np.save(os.path.join(args.out_dir, name.replace(".wav", "-mel.npy")),
                mel.T.astype(np.float32))  # (T, n_mels)
        n += 1
    print(f"cached {n} mels -> {args.out_dir}")


if __name__ == "__main__":
    main()

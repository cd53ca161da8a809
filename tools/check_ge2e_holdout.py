"""Gate: does the trained GE2E encoder generalize to truly-unseen
speakers?  Embeds the zero-shot holdout speakers' recordings and checks

  * self-cohesion: mean cos of each holdout utterance to its own
    speaker centroid (must be high — the encoder sees a stable voice)
  * nearest-train confusion: max cos of each holdout centroid to any
    TRAIN speaker centroid (must be < 1-ish — the round-4 failure mode
    was a held-out voice landing at cos 0.99 on a train centroid)

Exits non-zero when the thresholds fail, so chip-side CT training never
runs on an embedder that cannot express the zero-shot target.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _embed_speaker(inf, sdir: str, limit: int = 12):
    from cmtts_tpu.audio.wavio import read_wav

    embs = []
    for n in sorted(os.listdir(sdir))[:limit]:
        if not n.endswith(".wav"):
            continue
        wav, _ = read_wav(os.path.join(sdir, n))
        if len(wav) >= 1024:
            embs.append(inf.embed_utterance(wav))
    return np.stack(embs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--embedder_ckpt", required=True)
    ap.add_argument("--holdout_root", required=True)
    ap.add_argument("--train_root", required=True)
    ap.add_argument("--min_self_cos", type=float, default=0.75)
    ap.add_argument("--max_nearest_train_cos", type=float, default=0.9)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from cmtts_tpu.models.speaker import GE2EInference, load_ge2e_params

    inf = GE2EInference(load_ge2e_params(args.embedder_ckpt))

    train_cent = {}
    for spk in sorted(os.listdir(args.train_root)):
        sdir = os.path.join(args.train_root, spk)
        if not os.path.isdir(sdir):
            continue
        c = _embed_speaker(inf, sdir, limit=8).mean(axis=0)
        train_cent[spk] = c / (np.linalg.norm(c) + 1e-12)
    T = np.stack(list(train_cent.values()))

    report, ok = {}, True
    for spk in sorted(os.listdir(args.holdout_root)):
        sdir = os.path.join(args.holdout_root, spk)
        if not os.path.isdir(sdir):
            continue
        E = _embed_speaker(inf, sdir)
        cent = E.mean(axis=0)
        cent /= np.linalg.norm(cent) + 1e-12
        self_cos = float((E @ cent).mean())
        nearest = float((T @ cent).max())
        nearest_spk = list(train_cent)[int(np.argmax(T @ cent))]
        passed = (self_cos >= args.min_self_cos
                  and nearest <= args.max_nearest_train_cos)
        ok &= passed
        report[spk] = {"self_cos": round(self_cos, 4),
                       "nearest_train_cos": round(nearest, 4),
                       "nearest_train_spk": nearest_spk,
                       "pass": passed}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    if not ok:
        raise SystemExit(
            f"GE2E holdout gate FAILED (min_self_cos={args.min_self_cos}, "
            f"max_nearest_train_cos={args.max_nearest_train_cos})")
    print("GE2E holdout gate: PASS")


if __name__ == "__main__":
    main()

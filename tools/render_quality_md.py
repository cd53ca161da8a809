"""Render QUALITY_r05.json into the markdown tables for ROUND5_NOTES.

Usage: python tools/render_quality_md.py [QUALITY_r05.json]
Prints markdown to stdout; legs recorded as "absent" are skipped.
"""

from __future__ import annotations

import json
import sys

COLS = ["mcd", "ffe", "ssim", "f0_rmse"]
HDR = "| leg | MCD | FFE | SSIM | F0-RMSE (cents) |\n|---|---|---|---|---|"


def row(label: str, m: dict) -> str:
    cells = [f"{m[c]:.3f}" if c in m else "—" for c in COLS]
    return f"| {label} | " + " | ".join(cells) + " |"


def section(title: str, metrics) -> None:
    if not isinstance(metrics, dict) or not metrics:
        return
    print(f"\n### {title}\n\n{HDR}")
    for name, m in metrics.items():
        if isinstance(m, dict):
            print(row(name, m))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "QUALITY_r05.json"
    a = json.load(open(path))

    section("CT-20k, Griffin-Lim (qcorp, reference-parity config)",
            a.get("ct_griffinlim"))
    section("CT-20k, in-repo HiFi-GAN + GT-mel floor (qcorp)",
            a.get("ct_hifigan"))
    ab = a.get("cwt_masked_std_ab", {})
    section("maskstd synthesis A/B — B side, Griffin-Lim",
            ab.get("griffinlim"))
    section("maskstd synthesis A/B — B side, HiFi-GAN", ab.get("hifigan"))
    section("CD (CT stand-in teacher), Griffin-Lim",
            a.get("cd_from_ct_griffinlim", {}).get("metrics"))
    section("DET-prosody flagship CT-20k, Griffin-Lim",
            a.get("det_ct_griffinlim", {}).get("metrics"))
    section("DET-prosody flagship, HiFi-GAN + det floor",
            a.get("det_ct_hifigan", {}).get("metrics"))
    section("EDM diffusion teacher (heun-18)",
            a.get("edm_teacher", {}).get("metrics"))
    section("TRUE CD from the EDM teacher",
            a.get("cd_from_edm", {}).get("metrics"))

    abl = a.get("sampler_ablation_20k_T1")
    if isinstance(abl, dict) and abl:
        print(f"\n### Sampler ablation (20k steps, T=1 GL)\n\n{HDR}")
        for samp, runs in abl.items():
            for k in sorted(runs):
                if isinstance(runs[k], dict) and k.startswith("seed") and \
                        "loss_curve" not in k and "note" not in k:
                    print(row(f"{samp} / {k}", runs[k]))

    zs = a.get("zeroshot", {})
    evals = zs.get("evals")
    if isinstance(evals, dict) and evals:
        print("\n### Zero-shot identity transfer\n")
        print("| holdout speaker | cos→target | cos→others (mean) | "
              "top-1 | MCD vs GT | n |\n|---|---|---|---|---|---|")
        for spk, e in evals.items():
            mcd = e.get("mcd_vs_target_gt")
            print(f"| {spk} | {e.get('cos_to_target_mean', float('nan')):.3f}"
                  f" | {e.get('cos_to_others_mean', float('nan')):.3f} | "
                  f"{e.get('target_top1_accuracy', float('nan')):.3f} | "
                  f"{mcd if mcd is not None else '—'} | "
                  f"{e.get('n_synth', '—')} |")
        gate = zs.get("ge2e_holdout_gate")
        if isinstance(gate, dict):
            print(f"\nGE2E holdout gate: {json.dumps(gate)[:400]}")

    rep = a.get("bench_reproducibility")
    if isinstance(rep, dict):
        print("\n### Bench reproducibility\n")
        for k in ("run1", "run2"):
            r = rep.get(k)
            if isinstance(r, dict):
                print(f"- {k}: rtf_T1 = {r.get('value')}"
                      f" (vs_baseline {r.get('vs_baseline')})")
        if "rtf_T1_ratio_run2_over_run1" in rep:
            print(f"- run2/run1 = {rep['rtf_T1_ratio_run2_over_run1']}")


if __name__ == "__main__":
    main()

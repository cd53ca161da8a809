"""Roofline notes for the two hot graphs (round-4 VERDICT #8).

For each graph (synthesis T=1 fused text->mel->wav; the K=8 train step)
this derives, from XLA's own cost model (``compile().cost_analysis()``):

- flops            -> compute-bound floor  t_mxu = flops / peak_flops
- bytes accessed   -> HBM-bound floor      t_hbm = bytes / hbm_bw
- measured wall time per call (data-dependency-chained, one sync)

and reports which bound dominates and the fraction of the
speed-of-light roofline the measured time achieves:

    roofline_pct = max(t_mxu, t_hbm) / measured * 100

(MFU alone under-sells a memory-bound graph; roofline_pct says how far
the graph is from ITS OWN bound.)  Peaks: v5e 197 Tbf16FLOP/s, 819 GB/s
HBM (public spec); override with CMTTS_PEAK_FLOPS / CMTTS_HBM_BPS.

Usage (chip):  python tools/roofline.py [--train] [--synth] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def device_hbm_bps() -> float | None:
    env = os.environ.get("CMTTS_HBM_BPS")
    if env:
        return float(env)
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = (("v5 lite", 819e9), ("v5e", 819e9), ("v5p", 2765e9),
             ("v6 lite", 1640e9), ("v6e", 1640e9), ("v4", 1228e9),
             ("v3", 900e9), ("v2", 700e9))
    for key, bw in table:
        if key in kind:
            return bw
    return None


def analyze(name: str, lowered, run_once, n_iters: int = 10) -> dict:
    from tools.bench_train import device_peak_flops

    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))

    run_once()  # warmup (already compiled)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run_once(sync=False)
    run_once()  # dependency-chained; final call syncs
    measured = (time.perf_counter() - t0) / (n_iters + 1)

    peak = device_peak_flops() or float("nan")
    hbm = device_hbm_bps() or float("nan")
    t_mxu = flops / peak
    t_hbm = byts / hbm
    bound = "MXU (compute)" if t_mxu >= t_hbm else "HBM (bandwidth)"
    out = {
        "graph": name,
        "flops": flops,
        "bytes_accessed": byts,
        "arithmetic_intensity_flops_per_byte": round(flops / max(byts, 1.0), 2),
        "t_mxu_floor_ms": round(t_mxu * 1e3, 3),
        "t_hbm_floor_ms": round(t_hbm * 1e3, 3),
        "measured_ms": round(measured * 1e3, 3),
        "bound": bound,
        "mfu_pct": round(100.0 * flops / measured / peak, 2),
        "hbm_util_pct": round(100.0 * byts / measured / hbm, 2),
        "roofline_pct": round(100.0 * max(t_mxu, t_hbm) / measured, 2),
    }
    print(json.dumps(out), flush=True)
    return out


def synth_graph(T: int = 1, B: int = 8):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_pipeline

    cfg, synth, fn, a, B, mel_bucket = make_pipeline(T, B)
    args0 = (synth.cm_params, synth.vocoder_params, a["speakers"],
             a["texts"], a["src_lens"], a["spker_embeds"],
             jax.random.PRNGKey(0), 1.0, 1.0, 1.0)
    lowered = fn.lower(*args0)

    state = {"carry": jnp.zeros(())}

    def run_once(sync=True):
        mel, mel_lens, wav = fn(
            synth.cm_params, synth.vocoder_params, a["speakers"],
            a["texts"], a["src_lens"],
            a["spker_embeds"] + state["carry"] * 1e-20,
            jax.random.PRNGKey(1), 1.0, 1.0, 1.0)
        state["carry"] = wav.ravel()[::65536].sum()
        if sync:
            float(state["carry"])

    return lowered, run_once


def train_graph(K: int = 8, B: int = 32, t_mel: int = 768, t_txt: int = 96):
    """Standalone K-step train graph on synthetic batches (the
    tools/bench_train.py shape) — measures the device step, not the
    host feed."""
    import jax
    import jax.numpy as jnp

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.train.loop import make_train_step
    from cmtts_tpu.train.state import create_train_state, make_optimizer

    cfg = load_configs("LJSpeech")
    model = CMTTS(cfg)
    rng = np.random.RandomState(0)
    d = np.zeros((B, t_txt), np.int32)
    d[:] = t_mel // t_txt
    d[:, -1] += t_mel - d[0].sum()
    mel2ph = np.repeat(np.arange(1, t_txt + 1)[None], B, 0)
    mel2ph = np.repeat(mel2ph, t_mel // t_txt, axis=1)[:, :t_mel]
    batch = {
        "speakers": np.zeros(B, np.int32),
        "texts": rng.randint(13, 140, (B, t_txt)).astype(np.int32),
        "src_lens": np.full(B, t_txt, np.int32),
        "mels": rng.randn(B, t_mel, 80).astype(np.float32),
        "mel_lens": np.full(B, t_mel, np.int32),
        "mel2ph": mel2ph.astype(np.int32),
        "d_targets": d,
        "e_targets": rng.rand(B, t_txt).astype(np.float32),
        "p_targets": {
            "pitch": rng.randint(1, 255, (B, t_mel)).astype(np.int32),
            "f0": rng.rand(B, t_mel).astype(np.float32),
            "uv": (rng.rand(B, t_mel) > 0.7).astype(np.float32),
            "cwt_spec": rng.randn(B, t_mel, 10).astype(np.float32),
            "f0_mean": (5 + rng.rand(B)).astype(np.float32),
            "f0_std": (0.5 + rng.rand(B)).astype(np.float32),
        },
    }
    jb = {k: (jnp.asarray(v) if not isinstance(v, dict)
              else {kk: jnp.asarray(vv) for kk, vv in v.items()})
          for k, v in batch.items()}
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key}, jb["mels"], jnp.zeros(B),
        speakers=jb["speakers"], texts=jb["texts"], src_lens=jb["src_lens"],
        mel2ph=jb["mel2ph"], d_targets=jb["d_targets"],
        p_targets=jb["p_targets"], e_targets=jb["e_targets"],
        deterministic=True)
    tx = make_optimizer(1e-4)
    state = create_train_state(variables["params"], tx, 3)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                           compute_dtype=jnp.bfloat16, scan_steps=K)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), jb)
    probs = jnp.asarray([1.0 / 3, 2.0 / 3])
    emas = jnp.full((K,), 0.95)
    lowered = step.lower(state, stacked, probs, key, emas)

    holder = {"state": state}

    def run_once(sync=True):
        new_state, metrics = step(holder["state"], stacked, probs, key, emas)
        holder["state"] = new_state
        if sync:
            float(metrics["loss"][-1] if np.ndim(metrics["loss"]) else
                  metrics["loss"])

    return lowered, run_once


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--synth", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if not (args.train or args.synth):
        args.train = args.synth = True

    from cmtts_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    results = []
    if args.synth:
        lowered, run_once = synth_graph()
        results.append(analyze("synth_T1_B8_bucket768 (cond+sample+vocoder)",
                               lowered, run_once))
    if args.train:
        lowered, run_once = train_graph()
        r = analyze("train_K8_B32x768_bf16 (8 steps/call)", lowered, run_once)
        r["note"] = ("K=8 steps per call: per-step floors/measured are "
                     "1/8 of the listed values")
        results.append(r)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

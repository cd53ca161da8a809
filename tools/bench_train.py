"""Training-throughput microbench: steps/sec at batch 32x768 (full-size
LJSpeech model, bf16 compute), single-dispatch vs K-step scan driver.

Usage: python tools/bench_train.py [--K 8] [--iters 32] [--batch 32]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def device_peak_flops() -> float | None:
    """Per-chip peak matmul FLOP/s for the MFU denominator.

    bf16 systolic-array peaks (public TPU specs); override with
    CMTTS_PEAK_FLOPS for other hardware.  Returns None when unknown so
    the bench still reports raw FLOPs without a bogus MFU.
    """
    env = os.environ.get("CMTTS_PEAK_FLOPS")
    if env:
        return float(env)
    import jax

    kind = jax.devices()[0].device_kind.lower()
    # specific variants only — a bare family prefix ('v6') must NOT
    # match, or an unknown future variant would inherit another chip's
    # peak and skew MFU (ADVICE r4); unknowns return None so the bench
    # reports raw FLOPs without a bogus percentage
    table = (("v5 lite", 197e12), ("v5litepod", 197e12), ("v5e", 197e12),
             ("v5p", 459e12), ("v6 lite", 918e12), ("v6e", 918e12),
             ("v4", 275e12), ("v3", 123e12), ("v2", 46e12))
    for key, peak in table:
        if key in kind:
            return peak
    return None


def compiled_flops(jitted, *args) -> float | None:
    """FLOPs of one call from XLA's own cost model
    (``lowered.compile().cost_analysis()``) — machine-checked, not a
    hand count.  Lowering does not execute, so donated buffers survive."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older JAX returned [dict]
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32,
                    help="total optimizer steps per timed config")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t_mel", type=int, default=768)
    ap.add_argument("--t_txt", type=int, default=96)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--unroll", type=int, default=1,
                    help="denoiser residual-scan unroll factor")
    ap.add_argument("--skip_k1", action="store_true",
                    help="measure only the K-step scan config (halves "
                         "compile time; used by bench.py's budget-guarded "
                         "train extra)")
    args = ap.parse_args()

    import jax
    from cmtts_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.train.loop import make_train_step
    from cmtts_tpu.train.state import create_train_state, make_optimizer

    cfg = load_configs("LJSpeech")
    if args.unroll != 1:
        import dataclasses

        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, denoiser=dataclasses.replace(
                cfg.model.denoiser, scan_unroll=args.unroll)))
    model = CMTTS(cfg)
    B, T_txt, T_mel = args.batch, args.t_txt, args.t_mel
    rng = np.random.RandomState(0)
    d = np.full((B, T_txt), T_mel // T_txt, np.int32)
    d[:, -1] += T_mel - int(d.sum(1)[0])
    mel2ph = np.zeros((B, T_mel), np.int32)
    pos = 0
    for i in range(T_txt):
        mel2ph[:, pos: pos + d[0, i]] = i + 1
        pos += d[0, i]
    batch = {
        "speakers": jnp.zeros(B, jnp.int32),
        "texts": jnp.asarray(rng.randint(13, 140, (B, T_txt)).astype(np.int32)),
        "src_lens": jnp.full(B, T_txt, jnp.int32),
        "mels": jnp.asarray(rng.randn(B, T_mel, 80).astype(np.float32) * 0.5),
        "mel_lens": jnp.full(B, T_mel, jnp.int32),
        "mel2ph": jnp.asarray(mel2ph),
        "d_targets": jnp.asarray(d),
        "e_targets": jnp.asarray(rng.rand(B, T_txt).astype(np.float32)),
        "p_targets": {
            "pitch": jnp.asarray(rng.randint(1, 255, (B, T_mel)).astype(np.int32)),
            "f0": jnp.asarray(rng.rand(B, T_mel).astype(np.float32) * 2),
            "uv": jnp.asarray((rng.rand(B, T_mel) > 0.7).astype(np.float32)),
            "cwt_spec": jnp.asarray(rng.randn(B, T_mel, 10).astype(np.float32)),
            "f0_mean": jnp.asarray((5 + rng.rand(B)).astype(np.float32)),
            "f0_std": jnp.asarray((0.5 + rng.rand(B)).astype(np.float32)),
        },
    }
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key}, batch["mels"], jnp.zeros(B),
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mel2ph=batch["mel2ph"],
        d_targets=batch["d_targets"], p_targets=batch["p_targets"],
        e_targets=batch["e_targets"], deterministic=True)
    tx = make_optimizer(1e-4)
    compute_dtype = None if args.f32 else jnp.bfloat16
    # CM index grid: indices live in [0, num_scales-1) (reference
    # karras_diffusion.py:213) — probs has num_scales-1 entries
    probs = jnp.full((2,), 1 / 2)

    # host copy: donation inside each timed config must not eat the
    # shared init buffers
    params_host = jax.tree_util.tree_map(np.asarray, variables["params"])

    results = {}
    for K in ((args.K,) if args.skip_k1 else (1, args.K)):
        params = jax.tree_util.tree_map(jnp.asarray, params_host)
        state = create_train_state(params, tx, n_ema=3)
        step = make_train_step(model, cfg, tx, num_scales=3, donate=True,
                               compute_dtype=compute_dtype,
                               scan_steps=K if K > 1 else None)
        if K > 1:
            b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * K), batch)
            ema = jnp.full((K,), 0.95)
        else:
            b, ema = batch, jnp.asarray(0.95)
        n_calls = max(args.iters // K, 2)
        # XLA-cost-model FLOPs for the whole dispatch (K steps) -> per-step
        flops_call = compiled_flops(step, state, b, probs,
                                    jax.random.PRNGKey(1), ema)
        flops_step = flops_call / K if flops_call else None
        # warmup/compile
        state, m = step(state, b, probs, jax.random.PRNGKey(1), ema)
        float(np.mean(np.asarray(m["loss"])))
        t0 = time.perf_counter()
        for i in range(n_calls):
            state, m = step(state, b, probs, jax.random.fold_in(
                jax.random.PRNGKey(2), i), ema)
        loss = float(np.mean(np.asarray(m["loss"])))  # sync
        dt = time.perf_counter() - t0
        sps = n_calls * K / dt
        results[f"K{K}"] = dict(steps_per_sec=round(sps, 2),
                                ms_per_step=round(1000 / sps, 1),
                                loss=round(loss, 3))
        if flops_step:
            results[f"K{K}"]["flops_per_step"] = flops_step
            peak = device_peak_flops()
            if peak:
                results[f"K{K}"]["mfu_pct"] = round(
                    100.0 * flops_step * sps / peak, 2)
        print(json.dumps({"config": f"K={K}", "batch": B, "t_mel": T_mel,
                          "dtype": "f32" if args.f32 else "bf16",
                          "unroll": args.unroll,
                          **results[f"K{K}"]}), flush=True)
    if args.K > 1 and not args.skip_k1:
        print(json.dumps({"speedup_scan": round(
            results[f"K{args.K}"]["steps_per_sec"] /
            results["K1"]["steps_per_sec"], 2)}))


if __name__ == "__main__":
    main()

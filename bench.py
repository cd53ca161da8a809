"""End-to-end synthesis benchmark: RTF on one chip at T=1 (primary),
plus T=2/4 and mel-frames/sec extras.

Flagship LJSpeech-config CM-TTS + HiFi-GAN, fused text->mel->wav pipeline
(one XLA graph per bucket), batch 8, bf16 compute.  Metric = RTF
(synthesis wall-clock / generated audio seconds), the reference's
``p_rtf_cm.py`` definition (:174-230); north-star RTF <= 0.01
(BASELINE.md).  Prints one JSON line.

Timing methodology: the dev-environment TPU is reached through a tunnel
where (a) full-tensor device->host fetches are tunnel-bandwidth-bound and
(b) ``block_until_ready`` does not actually synchronize remote execution.
So the timed loop keeps everything on device with a data dependency
between iterations (output folded into the next input) and fetches ONE
scalar at the end — the scalar forces completion of the whole chain and
its single ~25 ms round trip is amortized over all iterations.
"""

import json
import os
import time

import numpy as np

# which weights the timed graph actually used (set by make_pipeline)
WEIGHTS_USED = ["random-init"]


def discover_checkpoint() -> str | None:
    """Default to trained weights whenever a checkpoint exists (VERDICT
    r3 weak #2): CMTTS_BENCH_CKPT wins; otherwise pick the highest-step
    checkpoint left by the quality pipeline on this machine.  Restore is
    try/except-guarded in make_pipeline so a stale/incompatible dir can
    never kill the headline metric."""
    ckpt = os.environ.get("CMTTS_BENCH_CKPT")
    if ckpt:
        return ckpt
    import glob

    for pattern in (
            "/tmp/qcorp/output/ckpt/LJSpeech/CMDenoiserTTS/step_*",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "output/ckpt/LJSpeech/CMDenoiserTTS/step_*")):
        steps = sorted(d for d in glob.glob(pattern) if os.path.isdir(d))
        if steps:
            return steps[-1]
    return None


def make_pipeline(T: int, B: int = 8):
    import jax
    import jax.numpy as jnp

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from cmtts_tpu.pipeline import Synthesizer

    # reset the label for THIS pipeline build: with multiple timed_rtf
    # calls a restore outcome that differs between calls must not leave
    # a stale / accreted label (ADVICE r4)
    WEIGHTS_USED[0] = "random-init"

    cfg = load_configs("LJSpeech")
    model = CMTTS(cfg)
    rng = jax.random.PRNGKey(0)

    T_TXT = 96
    tokens = np.stack([
        np.random.RandomState(i).randint(13, 140, T_TXT).astype(np.int32)
        for i in range(B)])

    ckpt = discover_checkpoint()
    params = None
    if ckpt:
        # load trained weights (checkpoint role: target_model — the
        # one-step synthesis model, reference train_util.py:718-727) so
        # the timed graph pushes a REAL mel through the vocoder.  RTF is
        # weight-independent (identical compute graph), verified vs the
        # random-init default; see docs/ROUND3_NOTES.md.
        try:
            from cmtts_tpu.train.checkpoint import (restore_checkpoint,
                                                    restore_payload_from_dir)
            if os.path.basename(ckpt).startswith("step_"):
                payload = restore_payload_from_dir(ckpt)
            else:
                payload = restore_checkpoint(ckpt)
            params = jax.tree_util.tree_map(jnp.asarray,
                                            payload["target_model"])
            WEIGHTS_USED[0] = f"trained(target_model:{ckpt})"
        except Exception as e:
            if os.environ.get("CMTTS_BENCH_CKPT"):
                # the operator EXPLICITLY asked for these weights — a
                # silent random-init fallback would publish a headline
                # under weights they did not ask for
                raise
            print(f"# bench: checkpoint restore failed ({e!r}); "
                  "falling back to random init", flush=True)
            params = None
    if params is None:
        variables = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((B, 128, cfg.stft.n_mel_channels)), jnp.zeros(B),
            speakers=jnp.zeros(B, jnp.int32),
            texts=jnp.asarray(tokens),
            src_lens=jnp.full((B,), T_TXT, jnp.int32),
            deterministic=True)
        params = variables["params"]
        # random init predicts ~0 duration; bias the duration head to ~6
        # frames/phoneme so the benchmark synthesizes realistic lengths
        params["variance_adaptor"]["duration_predictor"]["proj"]["bias"] = (
            jnp.full_like(
                params["variance_adaptor"]["duration_predictor"]["proj"]["bias"],
                float(np.log(7.0))))

    # vocoder weights: trained npz if one exists (RTF is weight-
    # independent — identical graph — but "weights: trained" should
    # cover the whole pipeline, not just the acoustic model)
    voc_params = None
    voc_ckpt = os.environ.get("CMTTS_BENCH_VOC_CKPT")
    if not voc_ckpt:
        import glob
        npzs = sorted(glob.glob("/tmp/voc_run/hifigan/hifigan_gen_*.npz"))
        voc_ckpt = npzs[-1] if npzs else None
    if voc_ckpt:
        try:
            from cmtts_tpu.models.hifigan import unflatten_npz
            voc_params = unflatten_npz(voc_ckpt)
            WEIGHTS_USED[0] += f" + vocoder({voc_ckpt})"
        except Exception as e:
            print(f"# bench: vocoder restore failed ({e!r}); random init",
                  flush=True)
            voc_params = None
    if voc_params is None:
        voc = HiFiGANGenerator(HiFiGANConfig())
        voc_params = voc.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 16, cfg.stft.n_mel_channels)))["params"]

    synth = Synthesizer(cfg, params, voc_params, T=T,
                        compute_dtype=jnp.bfloat16)
    mel_bucket = 768
    fn = synth._get(mel_bucket, True)
    base_args = dict(
        speakers=jnp.zeros(B, jnp.int32),
        texts=jnp.asarray(tokens),
        src_lens=jnp.full((B,), T_TXT, jnp.int32),
        spker_embeds=jnp.zeros((B, cfg.model.external_speaker_dim)),
    )
    return cfg, synth, fn, base_args, B, mel_bucket


def timed_rtf(T: int, n_iters: int = 20, B: int = 8, repeat: bool = False):
    """Returns (rtf, frames_per_sec, audio_sec, mfu, diag).

    Reproducibility (round-4 regression post-mortem): RTF = wall /
    generated-audio-seconds, and the DENOMINATOR depends on the
    checkpoint's duration predictions over the synthetic token batch —
    the r04 driver headline doubled purely because a different
    discovered checkpoint predicted shorter mels into the same 768-frame
    graph.  So the bench calibrates ``d_control`` (the reference's own
    duration knob) to pin mean frames/phoneme to ~6.0 (the LJSpeech
    average), making audio_sec checkpoint-independent; the calibration,
    compile time, and realized frames are all recorded in ``diag``.
    """
    import jax
    import jax.numpy as jnp

    cfg, synth, fn, a, B, mel_bucket = make_pipeline(T, B)
    diag = {"weights": WEIGHTS_USED[0]}

    # XLA-cost-model FLOPs of one fused text->mel->wav call (for MFU)
    flops = None
    try:
        cost = fn.lower(
            synth.cm_params, synth.vocoder_params, a["speakers"], a["texts"],
            a["src_lens"], a["spker_embeds"], jax.random.PRNGKey(0),
            1.0, 1.0, 1.0).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost["flops"])
    except Exception:
        pass

    def step(carry, i, d_control):
        mel, mel_lens, wav = fn(
            synth.cm_params, synth.vocoder_params,
            a["speakers"], a["texts"] + (carry % 2).astype(jnp.int32) * 0,
            a["src_lens"], a["spker_embeds"] + carry * 1e-20,
            jax.random.fold_in(jax.random.PRNGKey(0), i),
            d_control, 1.0, 1.0)
        # fold the output back into the next iteration's input:
        # guarantees sequential execution on device
        return wav.ravel()[::65536].sum(), (mel_lens, wav)

    # warmup / compile + duration calibration (d_control is a traced
    # scalar: changing it does NOT recompile)
    t_c = time.perf_counter()
    carry = jnp.zeros(())
    carry, (mel_lens, wav) = step(carry, 0, 1.0)
    float(carry)
    diag["compile_plus_first_exec_s"] = round(time.perf_counter() - t_c, 2)
    n_ph = int(np.asarray(a["src_lens"]).sum())
    fpp = float(np.asarray(mel_lens).sum()) / max(n_ph, 1)
    d_control = float(np.clip(6.0 / max(fpp, 1e-3), 0.25, 4.0))
    diag["frames_per_phoneme_raw"] = round(fpp, 3)
    diag["d_control"] = round(d_control, 3)
    carry, (mel_lens, wav) = step(carry, 0, d_control)  # settle new lens
    float(carry)

    def timed_loop():
        nonlocal carry, mel_lens, wav
        t0 = time.perf_counter()
        for i in range(1, n_iters + 1):
            carry, (mel_lens, wav) = step(carry, i, d_control)
        float(carry)  # one scalar fetch syncs the whole chain
        return time.perf_counter() - t0

    elapsed = timed_loop()

    frames = int(np.asarray(mel_lens).sum())
    audio_sec = frames * cfg.stft.hop_length / cfg.stft.sampling_rate
    per_iter = elapsed / n_iters
    diag["frames_per_iter"] = frames
    if repeat:
        # same compiled graph, second timed pass — run-to-run spread
        # within one process (cross-process spread is checked by running
        # the whole bench twice; both must land within ~20%)
        e2 = timed_loop()
        diag["rtf_run2"] = (e2 / n_iters) / audio_sec
    mfu = None
    if flops:
        from tools.bench_train import device_peak_flops

        peak = device_peak_flops()
        if peak:
            mfu = 100.0 * flops / per_iter / peak
    return per_iter / audio_sec, frames / per_iter, audio_sec, mfu, diag


def main():
    import jax

    from cmtts_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    t_start = time.perf_counter()
    rtf1, fps1, audio_sec, mfu1, diag1 = timed_rtf(1, repeat=True)
    extra = {
        "mel_frames_per_sec_per_chip_T1": fps1,
        "batch": 8,
        "audio_sec_per_iter": audio_sec,
        "compute_dtype": "bf16 denoiser / bf16-dot pallas vocoder",
        "device": str(jax.devices()[0]),
        "weights": diag1.pop("weights"),
        "diag_T1": diag1,
    }
    if mfu1 is not None:
        extra["synth_mfu_pct_T1_B8"] = round(mfu1, 2)
    # B=1 end-to-end latency — headline-adjacent (the latency-bound
    # serving shape), recorded UNCONDITIONALLY before the optional
    # passes (round-4 VERDICT #3: the budget gate starved it)
    budget_s = float(__import__("os").environ.get("BENCH_BUDGET_S", "2400"))
    rtf1b1, fps1b1, audio1b1, _, diag_b1 = timed_rtf(1, n_iters=20, B=1)
    extra["rtf_T1_B1"] = rtf1b1
    extra["latency_ms_T1_B1"] = rtf1b1 * audio1b1 * 1000.0
    extra["audio_sec_B1"] = audio1b1
    extra["diag_T1_B1"] = {k: diag_b1[k] for k in
                           ("compile_plus_first_exec_s", "d_control")
                           if k in diag_b1}
    # T=2/T=4 extras only while budget remains (each is a fresh compile
    # through the dev tunnel)
    if time.perf_counter() - t_start < 2 * budget_s / 3:
        rtf2, fps2, _, _, _ = timed_rtf(2, n_iters=8)
        extra["rtf_T2"] = rtf2
        extra["mel_frames_per_sec_per_chip_T2"] = fps2
        if time.perf_counter() - t_start < 3 * budget_s / 4:
            rtf4, fps4, _, _, _ = timed_rtf(4, n_iters=8)
            extra["rtf_T4"] = rtf4
            extra["mel_frames_per_sec_per_chip_T4"] = fps4

    # training-throughput extra (K-step scan driver, batch 32x768 bf16)
    # in a fresh subprocess so its compile/donation can't disturb the
    # timed synthesis graphs; skipped when the budget is nearly spent
    remaining = budget_s - (time.perf_counter() - t_start)
    if remaining > 420 and os.environ.get("CMTTS_BENCH_TRAIN", "1") != "0":
        import subprocess
        import sys

        try:
            out = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "bench_train.py"),
                 "--K", "8", "--iters", "16", "--skip_k1"],
                capture_output=True, text=True, timeout=remaining - 60)
            for line in out.stdout.splitlines():
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                if d.get("config") == "K=8":
                    extra["train_steps_per_sec_b32x768_bf16_K8"] = \
                        d["steps_per_sec"]
                    extra["train_ms_per_step"] = d["ms_per_step"]
                    if "mfu_pct" in d:
                        extra["train_mfu_pct"] = d["mfu_pct"]
                        extra["train_flops_per_step"] = d["flops_per_step"]
        except Exception as e:  # never let the extra kill the headline
            extra["train_bench_error"] = str(e)[:200]

    print(json.dumps({
        "metric": "rtf_T1",
        "value": rtf1,
        "unit": "wallclock/audio_sec",
        "vs_baseline": 0.01 / rtf1,
        "extra": extra,
    }))


def _arm_watchdog():
    """Fail loudly instead of hanging forever if the TPU tunnel is dead
    (device init / first compile never completes).  A daemon timer
    thread calling os._exit — NOT a Python signal handler, which can't
    run while the main thread is blocked inside a native runtime call
    (exactly the hang this guards against)."""
    import sys
    import threading

    deadline = int(os.environ.get("BENCH_HARD_TIMEOUT_S", "5400"))

    def boom():
        print(f"bench.py watchdog: no result within {deadline}s — "
              "TPU backend unreachable or compile stuck", file=sys.stderr)
        sys.stderr.flush()
        os._exit(2)

    t = threading.Timer(deadline, boom)
    t.daemon = True
    t.start()


if __name__ == "__main__":
    _arm_watchdog()
    main()

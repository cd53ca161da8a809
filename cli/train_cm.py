"""Consistency-model training CLI (reference ``train_cm.py`` surface).

Usage:
    python cli/train_cm.py --model consistency_training --dataset LJSpeech
        [--restore_step N] [--total_step N] [--config_root PATH]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True,
                        choices=["consistency_training",
                                 "consistency_distillation", "progdist",
                                 "edm"],
                        help="edm = true-diffusion teacher training "
                             "(EDM denoising score matching with "
                             "lognormal sigmas, reference "
                             "KarrasDenoiser.training_losses "
                             "karras_diffusion.py:104-137) — trains the "
                             "teacher that consistency_distillation then "
                             "distills")
    parser.add_argument("--teacher_path", type=str, default=None,
                        help="teacher checkpoint for distillation: orbax "
                             "step dir or reference torch model*.pt")
    parser.add_argument("--teacher_role", type=str, default="model",
                        help="checkpoint role to distill from (orbax "
                             "teachers): model | target_model | ema_0/1/2 "
                             "— an edm teacher's EMA (target_model) is "
                             "the usual choice")
    parser.add_argument("--teacher_edm", action="store_true", default=None,
                        help="drive the distillation teacher with plain "
                             "EDM (non-boundary) scalings — required when "
                             "the teacher is an edm-trained diffusion "
                             "model; auto-detected from the teacher's "
                             "run_config.json when present")
    parser.add_argument("--seed", type=int, default=None,
                        help="override train.yaml cm.seed (data order + "
                             "init + noise) — for multi-seed ablations")
    parser.add_argument("--weight_schedule", type=str, default=None,
                        choices=["uniform", "snr", "snr+1", "karras",
                                 "truncated-snr"],
                        help="override train.yaml cm.weight_schedule "
                             "(karras is the EDM-paper weighting for "
                             "--model edm)")
    parser.add_argument("--p_mean", type=float, default=-1.2,
                        help="edm mode: lognormal sigma mean (reference "
                             "LogNormalSampler, resample.py:240-260)")
    parser.add_argument("--p_std", type=float, default=1.2,
                        help="edm mode: lognormal sigma std")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--restore_step", type=int, default=0,
                        help="checkpoint step to resume from; -1 = "
                             "auto-resume from the latest COMPLETE "
                             "checkpoint in this run's ckpt dir (fresh "
                             "start if none) — makes queued runs "
                             "crash-restartable")
    parser.add_argument("--path_tag", type=str, default="")
    parser.add_argument("--config_root", type=str, default=None)
    parser.add_argument("--total_step", type=int, default=None,
                        help="override total training steps (smoke runs)")
    parser.add_argument("--log_every", type=int, default=None)
    parser.add_argument("--bf16", action="store_true",
                        help="run the model forward in bfloat16 (f32 master "
                             "params/opt/EMA; replaces the reference's "
                             "loss-scaled fp16 MixedPrecisionTrainer)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of steps 3-8 "
                             "into this directory (view with tensorboard)")
    parser.add_argument("--steps_per_call", type=int, default=1,
                        help="K>1 runs K optimizer steps per dispatch via "
                             "lax.scan on device (same-bucket batches are "
                             "windowed together) — amortizes host/tunnel "
                             "dispatch latency; LSM sampler probabilities "
                             "then update every K steps instead of every "
                             "step (reference updates per step)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree: Megatron-shard the "
                             "denoiser blocks (column-parallel gate/filter "
                             "convs, row-parallel out_proj) over a 2-D "
                             "(data x model) mesh; device_count/tp becomes "
                             "the data-parallel degree. 1 = pure DP "
                             "(reference is DDP-only, train_util.py:100-117)")
    # (lognormal is NOT a choice: LogNormalSampler draws continuous EDM
    # sigmas, not CM grid indices — reference keeps it separate too,
    # resample.py:240-260 vs create_named_schedule_sampler:26-43)
    parser.add_argument("--schedule_sampler", type=str, default=None,
                        choices=["uniform", "linear12", "linear21",
                                 "loss-second-moment"],
                        help="override train.yaml cm.schedule_sampler "
                             "(reference resample.py:26-43 names) — used "
                             "for sampler ablations without editing the "
                             "config")
    parser.add_argument("--cwt_masked_std", action="store_true",
                        help="padding-invariant inverse-CWT f0 in the "
                             "variance adaptor (fix over the reference's "
                             "padded standardization; see "
                             "audio/pitch.inverse_cwt_jnp). Use the same "
                             "flag at synthesis time.")
    parser.add_argument("--scan_unroll", type=int, default=None,
                        help="denoiser residual-stack lax.scan unroll "
                             "factor (clamped to the layer count; default: "
                             "model.yaml denoiser.scan_unroll, shipped as "
                             "full unroll). Full unroll lets XLA fuse/"
                             "pipeline across blocks: v5e batch 32x768 "
                             "bf16 train step 37.5 -> 32.5 ms "
                             "(tools/bench_train.py --unroll). 1 = "
                             "reference-like sequential scan, fastest "
                             "compile")
    args = parser.parse_args()

    import jax
    from cmtts_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from cmtts_tpu.core.config import load_configs
    from cmtts_tpu.data.dataset import FeatureDataset, batch_iterator
    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.parallel.sharding import (
        gather_per_sample, make_mesh, pad_batch_to_multiple, replicate_state,
        shard_batch)
    from cmtts_tpu.train import kvlogger
    from cmtts_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint, state_from_payload,
        wait_for_saves)
    from cmtts_tpu.train.ema import create_ema_and_scales_fn
    from cmtts_tpu.train.loop import make_synthesize_step, make_train_step
    from cmtts_tpu.train.resample import create_schedule_sampler
    from cmtts_tpu.train.state import create_train_state, make_optimizer

    cfg = load_configs(args.dataset, args.config_root)
    if args.cwt_masked_std:
        import dataclasses
        cfg = dataclasses.replace(cfg, pitch=dataclasses.replace(
            cfg.pitch, cwt_masked_std=True))
    cm = cfg.train.cm
    if cm.training_mode != args.model:
        import dataclasses
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, cm=dataclasses.replace(cm, training_mode=args.model)))
        cm = cfg.train.cm
    if (args.schedule_sampler is not None
            and args.schedule_sampler != cm.schedule_sampler):
        import dataclasses
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, cm=dataclasses.replace(
                cm, schedule_sampler=args.schedule_sampler)))
        cm = cfg.train.cm
    if (args.weight_schedule is not None
            and args.weight_schedule != cm.weight_schedule):
        import dataclasses
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, cm=dataclasses.replace(
                cm, weight_schedule=args.weight_schedule)))
        cm = cfg.train.cm
    if args.seed is not None and args.seed != cm.seed:
        import dataclasses
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, cm=dataclasses.replace(cm, seed=args.seed)))
        cm = cfg.train.cm
    if (args.scan_unroll is not None
            and args.scan_unroll != cfg.model.denoiser.scan_unroll):
        import dataclasses
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, denoiser=dataclasses.replace(
                cfg.model.denoiser, scan_unroll=args.scan_unroll)))

    total_step = args.total_step or cfg.train.total_step
    log_step = args.log_every or cfg.train.log_step
    save_step = cfg.train.save_step

    tag = f"_{args.path_tag}" if args.path_tag else ""
    if tag:
        # unlike the reference (which comments out ckpt_path tagging,
        # train_cm.py:180 — so a distillation run clobbers the CT run's
        # checkpoints), route ALL three output roles through the tag
        import dataclasses
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, ckpt_path=cfg.train.ckpt_path + tag))
    log_dir = os.path.join(cfg.train.log_path + "_cm" + tag, "train")
    logger = kvlogger.configure(log_dir)

    # persist graph-affecting run flags next to the checkpoints so
    # synthesis adopts them automatically (ADVICE r4: a maskstd-trained
    # checkpoint synthesized without the flag silently reintroduces the
    # train/infer standardization mismatch)
    from cmtts_tpu.train.checkpoint import write_run_config
    write_run_config(cfg.train.ckpt_path, {
        "training_mode": args.model,
        "cwt_masked_std": bool(cfg.pitch.cwt_masked_std),
        "schedule_sampler": cfg.train.cm.schedule_sampler,
        "weight_schedule": cfg.train.cm.weight_schedule,
        "seed": cfg.train.cm.seed,
        "dataset": args.dataset,
    })

    print(f"==> CM-TTS-TPU training: {args.model} on {args.dataset}")
    print(f"==> devices: {jax.devices()}")

    dataset = FeatureDataset("train.txt", cfg, sort=True, drop_last=True)
    print(f"==> dataset: {len(dataset)} utterances")

    model = CMTTS(cfg)
    ema_scale_fn = create_ema_and_scales_fn(
        cm.target_ema_mode, cm.start_ema, cm.scale_mode, cm.start_scales,
        cm.end_scales, cm.total_training_steps, cm.distill_steps_per_iter)
    # progdist samples indices in [0, N) vs the CM grid's [0, N-1)
    # (reference karras_diffusion.py:340 vs :213)
    sampler_scales = cm.start_scales + (1 if args.model == "progdist" else 0)
    if args.model == "edm":
        # edm draws continuous lognormal sigmas inside the jitted step
        # (loop.py); the discrete grid sampler is bypassed — pin it to
        # uniform so an LSM config can't try to ingest float sigmas
        sampler = create_schedule_sampler("uniform", sampler_scales)
    else:
        sampler = create_schedule_sampler(cm.schedule_sampler, sampler_scales)
    tx = make_optimizer(cm.lr, cm.weight_decay)

    from cmtts_tpu.data.native_loader import prefetch_iterator

    # one batch for shape/param init; the training feed itself is built
    # after the mesh exists (it bakes in cleaning/padding/stacking — see
    # feed_windows below) and restarts from epoch 0
    first = next(batch_iterator(dataset, cfg.train.batch_size,
                                cfg.train.group_size, seed=cm.seed))

    rng = jax.random.PRNGKey(cm.seed)
    step0 = args.restore_step
    if step0 < 0:
        from cmtts_tpu.train.checkpoint import latest_complete_step
        step0 = latest_complete_step(cfg.train.ckpt_path)
        print(f"==> auto-resume: "
              f"{f'step {step0}' if step0 else 'no checkpoint, fresh start'}")
    if step0 > 0:
        payload = restore_checkpoint(cfg.train.ckpt_path, step0)
        state = state_from_payload(payload, tx, len(cm.ema_rate))
        if "sampler" in payload and hasattr(sampler, "load_state_dict"):
            sampler.load_state_dict(payload["sampler"])
        print(f"==> restored step {step0}")
    else:
        def to_j(b):
            return {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                        ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                         if isinstance(v, dict) else v))
                    for k, v in b.items() if k not in ("ids", "raw_texts")}
        fb = to_j(first)
        variables = model.init(
            {"params": rng, "dropout": rng},
            fb["mels"], jnp.zeros(fb["mels"].shape[0]),
            speakers=fb["speakers"], texts=fb["texts"], src_lens=fb["src_lens"],
            mel2ph=fb["mel2ph"], d_targets=fb["d_targets"],
            p_targets=fb["p_targets"], e_targets=fb["e_targets"],
            spker_embeds=fb.get("spker_embeds"),
            deterministic=True)
        state = create_train_state(variables["params"], tx, len(cm.ema_rate))
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(variables["params"]))
        print(f"==> params: {n_params/1e6:.1f}M")

    teacher_params = None
    if args.model in ("consistency_distillation", "progdist"):
        tp = args.teacher_path or cm.teacher_model_path
        if not tp:
            raise SystemExit(f"{args.model} needs --teacher_path (or "
                             "cm.teacher_model_path in train.yaml)")
        if tp.endswith(".pt"):
            from cmtts_tpu.convert.from_torch import load_torch_cm_checkpoint

            teacher_params = load_torch_cm_checkpoint(tp, cfg)
        else:
            from cmtts_tpu.train.checkpoint import restore_payload_from_dir

            teacher_params = restore_payload_from_dir(tp)[args.teacher_role]
        teacher_params = jax.tree_util.tree_map(jnp.asarray, teacher_params)
        teacher_is_edm = args.teacher_edm
        if teacher_is_edm is None and not tp.endswith(".pt"):
            # auto-detect from the teacher run's sidecar: an edm-trained
            # teacher must be driven with plain (non-boundary) scalings
            import json
            rc_path = os.path.join(os.path.dirname(os.path.abspath(tp)),
                                   "run_config.json")
            if os.path.isfile(rc_path):
                with open(rc_path) as f:
                    teacher_is_edm = (
                        json.load(f).get("training_mode") == "edm")
        teacher_is_edm = bool(teacher_is_edm)
        print(f"==> loaded teacher from {tp} "
              f"({'edm' if teacher_is_edm else 'boundary'} scalings)")
        # student initializes from the teacher (reference
        # train_util.py:651-687 resume-from-teacher plumbing). The
        # student must get a COPY: the jitted step donates the state
        # buffers (loop.py:300-302), and aliasing them with the frozen
        # teacher would delete the teacher's arrays after step one.
        if step0 == 0:
            state = create_train_state(
                jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                       teacher_params),
                tx, len(cm.ema_rate))

    if args.tp > 1:
        from cmtts_tpu.parallel.sharding import make_mesh_2d, tp_shard_tree

        n_dev = jax.device_count()
        if n_dev % args.tp:
            raise SystemExit(f"--tp {args.tp} does not divide "
                             f"device_count {n_dev}")
        mesh = make_mesh_2d(n_dev // args.tp, args.tp)
        state = tp_shard_tree(state, mesh)
        print(f"==> mesh: dp{n_dev // args.tp} x tp{args.tp}")
    else:
        mesh = make_mesh()
        state = replicate_state(state, mesh)

    K = max(1, args.steps_per_call)
    if K > 1 and cm.scale_mode != "fixed":
        print("==> steps_per_call forced to 1: progressive scale_mode "
              "changes num_scales mid-window")
        K = 1

    _, num_scales = ema_scale_fn(step0)
    compute_dtype = jnp.bfloat16 if args.bf16 else None
    teacher_sched = None
    if teacher_params is not None and teacher_is_edm:
        import dataclasses
        from cmtts_tpu.train.loop import schedule_from_config
        teacher_sched = dataclasses.replace(
            schedule_from_config(cfg), distillation=False)
    train_step = make_train_step(model, cfg, tx, num_scales,
                                 teacher_params=teacher_params,
                                 compute_dtype=compute_dtype,
                                 scan_steps=K if K > 1 else None,
                                 teacher_sched=teacher_sched,
                                 edm_p_mean=args.p_mean,
                                 edm_p_std=args.p_std)
    synth_step = make_synthesize_step(model, cfg, with_viz=True)

    def shape_key(b):
        parts = []
        for k in sorted(b):
            v = b[k]
            if isinstance(v, np.ndarray):
                parts.append((k, v.shape))
            elif isinstance(v, dict):
                parts += [(k, kk, vv.shape) for kk, vv in sorted(v.items())]
        return tuple(parts)

    def stack_window(bs):
        out = {}
        for k, v0 in bs[0].items():
            if isinstance(v0, np.ndarray):
                out[k] = np.stack([b[k] for b in bs])
            elif isinstance(v0, dict):
                out[k] = {kk: np.stack([b[k][kk] for b in bs]) for kk in v0}
            else:
                out[k] = v0
        return out

    n_data = mesh.shape["data"]

    def _clean_pad(b):
        clean = {k: v for k, v in b.items() if k not in ("ids", "raw_texts")}
        if n_data > 1:
            # batches are sharded over the 'data' axis only, so the
            # batch must divide the data-parallel degree (NOT the
            # total device count: under --tp the 'model' axis shards
            # weights, not samples); pad by repeating the last sample
            # — sample_valid makes the duplicates' loss contribution
            # exactly zero
            clean, _orig = pad_batch_to_multiple(clean, n_data)
        return clean

    def feed_windows():
        """Device-ready training feed: clean/pad every batch and (K>1)
        group K same-bucket-shape batches into one stacked (K, B, ...)
        megabatch — same shapes -> one compiled scan graph per bucket
        combination.  Runs entirely on the prefetch producer thread so
        collation, padding and the window memcpy overlap the device
        steps and the host->device transfer of the previous window
        (transfers are network-bound on a tunneled device, so host CPU
        work hides under them even on a single-core host)."""
        it = batch_iterator(dataset, cfg.train.batch_size,
                            cfg.train.group_size, seed=cm.seed)
        if K == 1:
            for b in it:
                yield _clean_pad(b)
            return
        queues: dict = {}
        for b in it:
            q = queues.setdefault(shape_key(b), [])
            q.append(_clean_pad(b))
            if len(q) == K:
                yield stack_window(q)
                q.clear()

    # background-thread prefetch overlaps the whole host side of the
    # feed with device steps (the reference's DataLoader workers); the
    # native C++ loader additionally parallelizes the per-utterance npy
    # reads inside each mega-batch
    windows_ready = prefetch_iterator(feed_windows)

    step = step0 + 1  # first step of the upcoming window
    t_last = time.perf_counter()
    steps_since_log = 0
    prev_sync = None  # previous window's loss: in-flight dispatch bound
    profiling = False
    gl_cached = None  # Griffin-Lim built once, reused across audio logs

    def stop_profiler_if_active():
        # training can end (total_step / DIFFUSION_TRAINING_TEST) before
        # the steady-state stop threshold — flush the trace either way
        if profiling and args.profile_dir:
            jax.profiler.stop_trace()
            print("==> profiler trace written (early stop)")
    for ready in windows_ready:
        last_step = step + K - 1
        target_ema, new_scales = ema_scale_fn(step)
        if new_scales != num_scales:  # only reachable at K == 1
            num_scales = new_scales
            train_step = make_train_step(model, cfg, tx, num_scales,
                                         teacher_params=teacher_params,
                                         compute_dtype=compute_dtype,
                                         teacher_sched=teacher_sched,
                                         edm_p_mean=args.p_mean,
                                         edm_p_std=args.p_std)
            sampler = create_schedule_sampler(
                cm.schedule_sampler,
                num_scales + (1 if args.model == "progdist" else 0))

        if args.profile_dir:
            # trace a few steady-state steps (reference profile_kv scopes,
            # logger.py:292-316 — here the real deal: XLA op-level trace)
            if not profiling and step >= step0 + 1 + 2 * K:
                jax.profiler.start_trace(args.profile_dir)
                profiling = True
            elif profiling and step >= step0 + 1 + 7 * K:
                jax.profiler.stop_trace()
                args.profile_dir = None
                print("==> profiler trace written")

        rng, sub = jax.random.split(rng)
        probs = jnp.asarray(sampler.probs())
        if K == 1:
            sharded = shard_batch(ready, mesh)
            state, metrics = train_step(state, sharded, probs, sub,
                                        jnp.asarray(target_ema))
        else:
            sharded = shard_batch(ready, mesh, leading_axes=1)
            emas = jnp.asarray([ema_scale_fn(s)[0]
                                for s in range(step, step + K)])
            state, metrics = train_step(state, sharded, probs, sub, emas)

        # bound in-flight dispatches: sync on the PREVIOUS window's loss
        # so exactly one window stays in flight (transfer of window n
        # still overlaps compute of n-1).  Without this the tunneled
        # device client accepts every enqueued window's host->device
        # transfer without backpressure — observed at 20k steps: ~110 GB
        # host RSS (the entire remaining feed staged in client buffers)
        # followed by a wedged run.  Cost: one scalar round-trip per
        # window (~25 ms against ~1 s windows).
        if prev_sync is not None:
            float(prev_sync if np.ndim(prev_sync) == 0 else prev_sync[-1])
        prev_sync = metrics["loss"]

        if sampler.needs_update:
            # globally sharded per-sample outputs -> full global value on
            # every host (reference resample.py:117-153 all_gather); for
            # K>1 the history absorbs all K steps at once; padded
            # duplicate rows are dropped from the LSM history
            idx = gather_per_sample(metrics["indices"]).reshape(-1)
            lps = gather_per_sample(metrics["loss_per_sample"]).reshape(-1)
            if "sample_valid" in ready:
                sv = np.asarray(ready["sample_valid"]).reshape(-1) > 0
                idx, lps = idx[sv], lps[sv]
            sampler.update(idx, lps)

        steps_since_log += K
        if last_step // log_step > (step - 1) // log_step:
            m = {k: float(np.mean(np.asarray(v))) for k, v in metrics.items()
                 if np.ndim(v) <= (1 if K > 1 else 0)
                 and k not in ("indices", "loss_per_sample")}
            rng, sub = jax.random.split(rng)
            last_batch = (jax.tree_util.tree_map(lambda x: x[-1], sharded)
                          if K > 1 else sharded)
            mel_synth, mel_loss, viz = synth_step(state.target_params,
                                                  last_batch, sub)
            if logger.has_tb and \
                    last_step // cfg.train.synth_step > \
                    (step - 1) // cfg.train.synth_step:
                # mel/f0/energy/cwt comparison figures + a vocoded sample
                # (reference synth_one_sample_diff, utils/tools.py:294-345
                # + train_cm.py:98-118)
                from cmtts_tpu.utils_plot import (contour_comparison_figure,
                                                  mel_comparison_figure)

                L = int(np.asarray(last_batch["mel_lens"][0]))
                gt0 = np.asarray(last_batch["mels"][0])[:L]
                syn0 = np.asarray(mel_synth[0])[:L]
                logger.log_figure(
                    "synth/mel_comparison",
                    mel_comparison_figure(gt0, syn0, f"step {last_step}"),
                    last_step)
                if "f0_target" in viz:
                    logger.log_figure(
                        "synth/f0_comparison",
                        contour_comparison_figure(
                            np.asarray(viz["f0_target"][0])[:L],
                            np.asarray(viz["f0_pred"][0])[:L],
                            f"f0 — step {last_step}", "f0 (Hz)"),
                        last_step)
                if "cwt_target" in viz:
                    logger.log_figure(
                        "synth/cwt_comparison",
                        mel_comparison_figure(
                            np.asarray(viz["cwt_target"][0])[:L],
                            np.asarray(viz["cwt_pred"][0])[:L],
                            f"pitch cwt — step {last_step}"),
                        last_step)
                if "e_target" in viz:
                    logger.log_figure(
                        "synth/energy_comparison",
                        contour_comparison_figure(
                            np.asarray(viz["e_target"][0])[:L],
                            np.asarray(viz["e_pred"][0])[:L],
                            f"energy — step {last_step}", "energy"),
                        last_step)
                try:
                    if gl_cached is None:
                        from cmtts_tpu.audio.stft import (GriffinLim,
                                                          MelSpectrogram)

                        gl_cached = GriffinLim(MelSpectrogram(
                            cfg.stft.sampling_rate, cfg.stft.filter_length,
                            cfg.stft.hop_length, cfg.stft.win_length,
                            cfg.stft.n_mel_channels, cfg.stft.mel_fmin,
                            cfg.stft.mel_fmax), n_iters=32)
                    logger.log_audio("synth/onestep_audio", gl_cached(syn0),
                                     cfg.stft.sampling_rate, last_step)
                except Exception as e:  # audio is best-effort
                    print(f"==> TB audio logging skipped: {e}")
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            logger.logkv("step", last_step)
            logger.logkv("mel_loss_onestep", float(mel_loss))
            logger.logkv("steps_per_sec", steps_since_log / dt)
            steps_since_log = 0
            for k, v in m.items():
                logger.logkv(k, v)
            logger.dumpkvs()

        if (last_step // save_step > (step - 1) // save_step
                or last_step >= total_step):
            sampler_state = (sampler.state_dict()
                             if hasattr(sampler, "state_dict") else None)
            # async save: the directory write overlaps the next steps
            # (wait_for_saves before exit / restore keeps it safe)
            path = save_checkpoint(cfg.train.ckpt_path, state, sampler_state,
                                   blocking=False)
            print(f"==> saving {path} (async)")
            if os.environ.get("DIFFUSION_TRAINING_TEST", ""):
                print("==> DIFFUSION_TRAINING_TEST set; stopping after first save")
                stop_profiler_if_active()
                wait_for_saves()
                return

        if last_step >= total_step:
            print("==> training complete")
            stop_profiler_if_active()
            wait_for_saves()
            return
        step = last_step + 1


if __name__ == "__main__":
    main()

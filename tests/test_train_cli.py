"""End-to-end drive of the cli/train_cm.py training loop as a real
subprocess on the 8-device CPU mesh — the only place the full feed
pipeline (prefetched clean/pad/stack windows -> shard_batch ->
K-step scan -> LSM history update -> checkpoint) runs together.

Covers the round-4 feed refactor: window assembly moved onto the
prefetch producer thread, batch padding to the data axis (batch 2 on
8 devices -> sample_valid zeroes 6 duplicate rows), and the
loss-second-moment sampler consuming per-sample losses from the
stacked window layout.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_cli_dp8_padded_lsm(tmp_path):
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
           "DIFFUSION_TRAINING_TEST": "1"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = str(tmp_path / "corpus")

    subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "gen_corpus.py"),
         "--out", out, "--n", "12", "--val_size", "2",
         "--batch_size", "2", "--tiny", "--log_step", "2"],
        check=True, env=env, capture_output=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "preprocess.py"),
         "--dataset", "LJSpeech", "--config_root", f"{out}/config"],
        check=True, env=env, capture_output=True)

    # K=2 scan windows + LSM sampler + batch 2 padded to the 8-way data
    # axis: every feed-path branch at once
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train_cm.py"),
         "--model", "consistency_training", "--dataset", "LJSpeech",
         "--config_root", f"{out}/config", "--total_step", "4",
         "--steps_per_call", "2",
         "--schedule_sampler", "loss-second-moment"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    csv = os.path.join(out, "output/log/LJSpeech_cm/train/progress.csv")
    assert os.path.isfile(csv), r.stdout[-2000:]
    rows = open(csv).read().strip().splitlines()
    assert len(rows) >= 2  # header + at least one logged window
    header = rows[0].split(",")
    vals = dict(zip(header, rows[-1].split(",")))
    assert np.isfinite(float(vals["loss"])), vals

    ckpts = os.listdir(os.path.join(
        out, "output/ckpt/LJSpeech/CMDenoiserTTS"))
    assert any(c.startswith("step_") for c in ckpts), ckpts


@pytest.mark.slow
def test_train_cli_edm_then_distill(tmp_path):
    """EDM diffusion-teacher training -> TRUE consistency distillation
    from its EMA role -> heun synthesis from the teacher, all through
    the real CLIs (the round-5 VERDICT #7 protocol, tiny scale)."""
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "DIFFUSION_TRAINING_TEST": "1"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = str(tmp_path / "corpus")

    subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "gen_corpus.py"),
         "--out", out, "--n", "12", "--val_size", "2",
         "--batch_size", "2", "--tiny", "--log_step", "2",
         "--det_prosody"],
        check=True, env=env, capture_output=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "preprocess.py"),
         "--dataset", "LJSpeech", "--config_root", f"{out}/config"],
        check=True, env=env, capture_output=True)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train_cm.py"),
         "--model", "edm", "--dataset", "LJSpeech",
         "--config_root", f"{out}/config", "--total_step", "2",
         "--weight_schedule", "karras", "--path_tag", "edm"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    ckpt_root = os.path.join(out, "output/ckpt/LJSpeech_edm")
    steps = sorted(os.listdir(os.path.join(ckpt_root, "CMDenoiserTTS")))
    step_dirs = [s for s in steps if s.startswith("step_")]
    assert step_dirs, steps
    # run-config sidecar recorded the edm mode (ADVICE r4 persistence)
    import json
    rc = json.load(open(os.path.join(ckpt_root, "CMDenoiserTTS",
                                     "run_config.json")))
    assert rc["training_mode"] == "edm"
    teacher = os.path.join(ckpt_root, "CMDenoiserTTS", step_dirs[-1])
    step_n = int(step_dirs[-1].split("_")[1])

    # heun synthesis from the edm teacher (plain scalings adopted from
    # the sidecar — no --model flag needed)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "synthesize.py"),
         "--mode", "batch", "--source", f"{out}/pre/val.txt",
         "--dataset", "LJSpeech", "--config_root", f"{out}/config",
         "--T", "1", "--sampler", "heun", "--sample_steps", "4",
         "--restore_step", str(step_n), "--vocoder", "none",
         "--params_role", "target_model", "--path_tag", "edm"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    syn = os.path.join(out, "output/result/LJSpeech_cm_edm",
                       f"step_{step_n}_T1_heun4")
    assert any(f.endswith("-mel.npy") for f in os.listdir(syn))

    # TRUE consistency distillation from the teacher's EMA role; the
    # edm teacher scaling choice must be auto-detected from the sidecar
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train_cm.py"),
         "--model", "consistency_distillation",
         "--teacher_path", teacher, "--teacher_role", "target_model",
         "--dataset", "LJSpeech", "--config_root", f"{out}/config",
         "--total_step", "2", "--path_tag", "cdedm"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "edm scalings" in r.stdout, r.stdout[-2000:]

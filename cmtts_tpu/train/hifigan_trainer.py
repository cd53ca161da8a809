"""HiFi-GAN vocoder trainer (generator + MPD/MSD adversarial training).

The reference repo only *consumes* HiFi-GAN checkpoints
(``utils/model.py:155-184``) and the blobs are absent from the snapshot
(``.MISSING_LARGE_BLOBS:3-5``) — so the rebuilt framework must be able
to train its own vocoder.  This implements the HiFi-GAN training recipe
(Kong et al. 2020, arXiv 2010.05646):

    L_D = sum_k E[(1 - D_k(y))^2] + E[D_k(G(s))^2]
    L_G = sum_k E[(1 - D_k(G(s)))^2] + lambda_fm L_FM + lambda_mel L_mel
    lambda_fm = 2, lambda_mel = 45, AdamW(2e-4, b1=0.8, b2=0.99),
    exponential lr decay 0.999, random fixed-length waveform segments.

TPU-first design decisions:

- **One fused jitted step** runs D-forward(real) + D-forward(fake) +
  D-update, then G-forward + both D-forwards again + G-update — a
  single XLA graph per step (the torch recipe dispatches ~10 separate
  graphs).  D is updated first and G differentiates through the
  *updated* D, matching the official ordering.
- **Static shapes**: fixed ``segment_size`` sample crops; the input mel
  is computed on device from the same crop (vmapped
  :class:`cmtts_tpu.audio.stft.MelSpectrogram`), cropped to
  ``segment_size // hop`` frames so G's output length equals the real
  segment exactly.
- **f32 end-to-end**: GAN losses are variance-sensitive; the generator
  runs bf16 under the *inference* pipeline, but training keeps f32
  (the MXU still runs bf16 passes inside XLA's f32 convs).

The trained generator exports as a flat ``a/b/c``-keyed ``.npz`` that
``cmtts_tpu.models.hifigan.load_hifigan_params`` (and therefore
``cli/synthesize.py --vocoder_ckpt``) loads directly.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cmtts_tpu.audio.stft import MelSpectrogram
from cmtts_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
from cmtts_tpu.models.hifigan_disc import (
    HiFiGANDiscConfig,
    HiFiGANDiscriminators,
    discriminator_loss,
    feature_matching_loss,
    generator_adv_loss,
)


@dataclass(frozen=True)
class HiFiGANTrainConfig:
    segment_size: int = 8192
    batch_size: int = 16
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    weight_decay: float = 0.01
    lr_decay: float = 0.999
    lr_decay_steps: int = 500     # official decays per epoch; ~500 steps here
    lambda_mel: float = 45.0
    lambda_fm: float = 2.0
    seed: int = 0


def make_mel_fn(stft: MelSpectrogram, hop: int):
    """(B, T) waveform -> (B, T//hop, n_mels) log-mel, batched on device."""

    def one(wav):
        mel, _ = stft.mel_and_energy(wav)
        return mel.T  # (frames, n_mels)

    def mel_fn(wavs):
        n_frames = wavs.shape[1] // hop
        return jax.vmap(one)(wavs)[:, :n_frames, :]

    return mel_fn


def _make_optims(cfg: HiFiGANTrainConfig):
    sched = optax.exponential_decay(
        cfg.learning_rate, cfg.lr_decay_steps, cfg.lr_decay)
    mk = lambda: optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                             weight_decay=cfg.weight_decay)
    return mk(), mk()


def init_hifigan_train(cfg: HiFiGANTrainConfig,
                       gen_cfg: HiFiGANConfig | None = None,
                       disc_cfg: HiFiGANDiscConfig | None = None):
    """Returns (state dict, generator module, discriminator module)."""
    gen_cfg = gen_cfg or HiFiGANConfig()
    disc_cfg = disc_cfg or HiFiGANDiscConfig()
    gen = HiFiGANGenerator(gen_cfg)
    disc = HiFiGANDiscriminators(disc_cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(cfg.seed))
    n_frames = max(cfg.segment_size // gen_cfg.hop_length, 1)
    gp = gen.init(k1, jnp.zeros((1, n_frames, gen_cfg.num_mels)))["params"]
    dp = disc.init(k2, jnp.zeros((1, cfg.segment_size)))["params"]
    tx_g, tx_d = _make_optims(cfg)
    state = {
        "gen": gp, "disc": dp,
        "opt_g": tx_g.init(gp), "opt_d": tx_d.init(dp),
        "step": jnp.zeros((), jnp.int32),
    }
    return state, gen, disc


def make_hifigan_train_step(gen: HiFiGANGenerator,
                            disc: HiFiGANDiscriminators,
                            stft: MelSpectrogram,
                            cfg: HiFiGANTrainConfig,
                            paired: bool = False):
    """Fused D-then-G update; returns (state, metrics dict).

    ``paired=False`` (from-scratch): the step takes (state, wavs) and
    computes G's input mel from the waveform crop itself.
    ``paired=True`` (fine-tuning, HiFi-GAN paper sec. 4.2): the step
    takes (state, wavs, in_mels) where ``in_mels`` are externally
    produced (e.g. teacher-forced TTS-predicted) mels aligned to the
    ground-truth waveform crop; the mel reconstruction loss always
    targets the *ground-truth* waveform's mel.
    """
    tx_g, tx_d = _make_optims(cfg)
    mel_fn = make_mel_fn(stft, gen.cfg.hop_length)

    def step(state, wavs, in_mels=None):
        mels = in_mels if paired else mel_fn(wavs)
        target_mels = mel_fn(wavs) if paired else mels
        y_hat = gen.apply({"params": state["gen"]}, mels)
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        def d_loss_fn(dp):
            real = disc.apply({"params": dp}, wavs)
            fake = disc.apply({"params": dp}, y_hat_sg)
            return discriminator_loss(real, fake)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state["disc"])
        d_updates, opt_d = tx_d.update(d_grads, state["opt_d"], state["disc"])
        disc_params = optax.apply_updates(state["disc"], d_updates)

        def g_loss_fn(gp):
            yh = gen.apply({"params": gp}, mels)
            mel_hat = mel_fn(yh)
            real = disc.apply({"params": disc_params}, wavs)
            fake = disc.apply({"params": disc_params}, yh)
            adv = generator_adv_loss(fake)
            fm = feature_matching_loss(real, fake)
            mel_l1 = jnp.abs(mel_hat - target_mels).mean()
            total = adv + cfg.lambda_fm * fm + cfg.lambda_mel * mel_l1
            return total, {"g_adv": adv, "g_fm": fm, "mel_l1": mel_l1}

        (g_loss, parts), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state["gen"])
        g_updates, opt_g = tx_g.update(g_grads, state["opt_g"], state["gen"])
        gen_params = optax.apply_updates(state["gen"], g_updates)

        new_state = {"gen": gen_params, "disc": disc_params,
                     "opt_g": opt_g, "opt_d": opt_d,
                     "step": state["step"] + 1}
        metrics = {"d_loss": d_loss, "g_loss": g_loss, **parts}
        return new_state, metrics

    return jax.jit(step, donate_argnums=0)


class WaveSegmentSampler:
    """Random fixed-length segments from a directory tree of wavs
    (recursively); short files are cyclically tiled.  Everything stays
    host-side numpy — the device only ever sees (B, segment) f32."""

    def __init__(self, wav_root: str, segment_size: int,
                 sampling_rate: int = 22050, max_files: int | None = None):
        from cmtts_tpu.audio.wavio import read_wav, resample_linear

        self.segment = segment_size
        self.wavs: list[np.ndarray] = []
        paths = []
        for dirpath, _, names in sorted(os.walk(wav_root)):
            for n in sorted(names):
                if n.endswith(".wav"):
                    paths.append(os.path.join(dirpath, n))
        if max_files:
            paths = paths[:max_files]
        for p in paths:
            wav, sr = read_wav(p)
            if sr != sampling_rate:
                wav = resample_linear(wav, sr, sampling_rate)
            w = np.asarray(wav, np.float32)
            if len(w) < segment_size:
                reps = int(np.ceil(segment_size / max(len(w), 1)))
                w = np.tile(w, reps)
            self.wavs.append(w)
        if not self.wavs:
            raise ValueError(f"no wavs under {wav_root}")

    def sample(self, rng: np.random.RandomState, batch: int) -> np.ndarray:
        out = np.empty((batch, self.segment), np.float32)
        idx = rng.randint(0, len(self.wavs), batch)
        for i, j in enumerate(idx):
            w = self.wavs[j]
            off = rng.randint(0, len(w) - self.segment + 1)
            out[i] = w[off: off + self.segment]
        return out


class MelWavPairSampler:
    """Aligned (mel, waveform) segment pairs for vocoder *fine-tuning*
    on externally produced mels (e.g. teacher-forced TTS-predicted
    mels, HiFi-GAN paper sec. 4.2).

    ``mel_dir`` holds ``<spk>-mel-<base>.npy`` (preprocessor layout) or
    ``<base>-mel.npy`` (synthesize-CLI layout) files with shape
    (frames, n_mels) or (n_mels, frames); ``wav_root`` is searched
    recursively for ``<base>.wav``.  Pairs whose lengths disagree by
    more than ``tolerance_frames`` are skipped with a warning (the mel
    must describe the same trimmed waveform)."""

    def __init__(self, mel_dir: str, wav_root: str, segment_frames: int,
                 hop: int = 256, sampling_rate: int = 22050,
                 n_mels: int = 80, tolerance_frames: int = 20):
        from cmtts_tpu.audio.wavio import read_wav, resample_linear

        self.hop, self.F = hop, segment_frames
        wav_by_base = {}
        for dirpath, _, names in sorted(os.walk(wav_root)):
            for n in sorted(names):
                if n.endswith(".wav"):
                    wav_by_base[n[:-4]] = os.path.join(dirpath, n)
        self.pairs: list[tuple[np.ndarray, np.ndarray]] = []
        skipped = 0
        for n in sorted(os.listdir(mel_dir)):
            if not n.endswith(".npy"):
                continue
            stem = n[:-4]
            if "-mel-" in stem:                      # <spk>-mel-<base>
                base = stem.split("-mel-", 1)[1]
            elif stem.endswith("-mel"):              # <base>-mel
                base = stem[:-4]
            else:
                base = stem
            path = wav_by_base.get(base)
            if path is None:
                skipped += 1
                continue
            mel = np.load(os.path.join(mel_dir, n)).astype(np.float32)
            if mel.ndim != 2:
                skipped += 1
                continue
            if mel.shape[0] == n_mels and mel.shape[1] != n_mels:
                mel = mel.T                          # (frames, n_mels)
            wav, sr = read_wav(path)
            if sr != sampling_rate:
                wav = resample_linear(wav, sr, sampling_rate)
            wav = np.asarray(wav, np.float32)
            frames = min(mel.shape[0], len(wav) // hop)
            if abs(mel.shape[0] - len(wav) / hop) > tolerance_frames \
                    or frames < 1:
                skipped += 1
                continue
            mel, wav = mel[:frames], wav[: frames * hop]
            if frames < segment_frames:
                reps = int(np.ceil(segment_frames / frames))
                mel = np.tile(mel, (reps, 1))
                wav = np.tile(wav, reps)
            self.pairs.append((mel, wav))
        if skipped:
            import warnings

            warnings.warn(f"MelWavPairSampler: skipped {skipped} "
                          f"unmatched/misaligned mel files")
        if not self.pairs:
            raise ValueError(
                f"no aligned (mel, wav) pairs between {mel_dir} and "
                f"{wav_root}")

    def sample(self, rng: np.random.RandomState, batch: int):
        """-> (wavs (B, F*hop), mels (B, F, n_mels))."""
        n_mels = self.pairs[0][0].shape[1]
        wavs = np.empty((batch, self.F * self.hop), np.float32)
        mels = np.empty((batch, self.F, n_mels), np.float32)
        idx = rng.randint(0, len(self.pairs), batch)
        for i, j in enumerate(idx):
            mel, wav = self.pairs[j]
            f0 = rng.randint(0, mel.shape[0] - self.F + 1)
            mels[i] = mel[f0: f0 + self.F]
            wavs[i] = wav[f0 * self.hop: (f0 + self.F) * self.hop]
        return wavs, mels


def flatten_params(tree, prefix="") -> dict:
    """Nested params -> flat ``a/b/c`` keys (inverse of
    ``hifigan.unflatten_npz``)."""
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def save_hifigan(state, out_dir: str, step: int):
    """Write the loadable generator npz + a full-resume pickle."""
    os.makedirs(out_dir, exist_ok=True)
    gen_path = os.path.join(out_dir, f"hifigan_gen_{step:08d}.npz")
    np.savez(gen_path, **flatten_params(jax.device_get(state["gen"])))
    full = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    np.save(os.path.join(out_dir, "hifigan_train_state.npy"),
            np.asarray([full], dtype=object), allow_pickle=True)
    with open(os.path.join(out_dir, "hifigan_train_meta.json"), "w") as f:
        json.dump({"step": int(step), "generator_npz": gen_path}, f)
    return gen_path


def load_hifigan_train_state(out_dir: str):
    arr = np.load(os.path.join(out_dir, "hifigan_train_state.npy"),
                  allow_pickle=True)
    return arr[0]


def train_hifigan(wav_root: str, out_dir: str, total_steps: int,
                  cfg: HiFiGANTrainConfig | None = None,
                  gen_cfg: HiFiGANConfig | None = None,
                  disc_cfg: HiFiGANDiscConfig | None = None,
                  log_every: int = 50, save_every: int = 2000,
                  resume: bool = False, max_files: int | None = None,
                  finetune_mel_dir: str | None = None,
                  init_gen_npz: str | None = None,
                  log_fn=print):
    """Compact driver; returns the final state.  ``finetune_mel_dir``
    switches to paired fine-tuning on external mels;
    ``init_gen_npz`` warm-starts the generator from an exported npz
    (typical fine-tune flow: from-scratch run -> export -> fine-tune on
    TTS-predicted mels)."""
    cfg = cfg or HiFiGANTrainConfig()
    gen_cfg = gen_cfg or HiFiGANConfig()
    state, gen, disc = init_hifigan_train(cfg, gen_cfg, disc_cfg)
    if init_gen_npz:
        from cmtts_tpu.models.hifigan import unflatten_npz

        state["gen"] = jax.tree_util.tree_map(
            jnp.asarray, unflatten_npz(init_gen_npz))
        log_fn(f"generator warm-started from {init_gen_npz}")
    if resume and os.path.exists(
            os.path.join(out_dir, "hifigan_train_state.npy")):
        state = load_hifigan_train_state(out_dir)
        log_fn(f"resumed hifigan trainer at step {int(state['step'])}")
    stft = MelSpectrogram(
        sampling_rate=gen_cfg.sampling_rate,
        n_mel_channels=gen_cfg.num_mels)
    paired = finetune_mel_dir is not None
    step_fn = make_hifigan_train_step(gen, disc, stft, cfg, paired=paired)
    if paired:
        sampler = MelWavPairSampler(
            finetune_mel_dir, wav_root,
            cfg.segment_size // gen_cfg.hop_length, gen_cfg.hop_length,
            gen_cfg.sampling_rate, gen_cfg.num_mels)
    else:
        sampler = WaveSegmentSampler(wav_root, cfg.segment_size,
                                     gen_cfg.sampling_rate, max_files)
    rng = np.random.RandomState(cfg.seed)
    start = int(state["step"])
    for step in range(start + 1, total_steps + 1):
        if paired:
            wavs, in_mels = sampler.sample(rng, cfg.batch_size)
            state, metrics = step_fn(state, jnp.asarray(wavs),
                                     jnp.asarray(in_mels))
        else:
            wavs = sampler.sample(rng, cfg.batch_size)
            state, metrics = step_fn(state, jnp.asarray(wavs))
        if step % log_every == 0 or step == total_steps:
            m = {k: float(v) for k, v in metrics.items()}
            log_fn(f"hifigan step {step}: " +
                   " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())))
        if step % save_every == 0 or step == total_steps:
            path = save_hifigan(state, out_dir, step)
            log_fn(f"saved {path}")
    return state

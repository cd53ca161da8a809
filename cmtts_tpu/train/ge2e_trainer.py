"""GE2E speaker-encoder trainer (reference ``ge2e_encoder/train.py`` +
``data_objects/``): sample S speakers x U partial utterances, minimize
the GE2E softmax loss over the scaled similarity matrix.

TPU-first: one jitted step (loss -> grad -> clip -> Adam), the
similarity-parameter gradient scaling (x0.01) and global-norm clip 3
from the reference ``do_gradient_ops`` (ge2e_encoder/model.py:33-39).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cmtts_tpu.models.speaker import (
    GE2E_MEL_CHANNELS,
    GE2E_PARTIAL_FRAMES,
    GE2EEncoder,
    ge2e_loss,
    ge2e_mel_frames,
)


@dataclass
class GE2ETrainConfig:
    speakers_per_batch: int = 64          # params_model.py
    utterances_per_speaker: int = 10
    learning_rate: float = 1e-4
    clip_norm: float = 3.0
    sim_grad_scale: float = 0.01


class SpeakerVerificationDataset:
    """<root>/<speaker>/*.npy partial-frame files, each (160, 40).

    ``prepare_from_wavs`` builds the cache from raw wav folders
    (reference encoder_preprocess path)."""

    def __init__(self, root: str, speakers: list[str] | None = None):
        self.root = root
        self.speakers = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
        if speakers is not None:
            self.speakers = [s for s in self.speakers if s in set(speakers)]
        self.files = {
            s: sorted(f for f in os.listdir(os.path.join(root, s))
                      if f.endswith(".npy"))
            for s in self.speakers}
        self.speakers = [s for s in self.speakers if len(self.files[s]) > 0]
        if not self.speakers:
            raise ValueError(f"no speaker partials under {root}")

    @staticmethod
    def prepare_from_wavs(wav_root: str, out_root: str, sr: int = 22050):
        """Slice each <wav_root>/<speaker>/*.wav into 160-frame partials."""
        from cmtts_tpu.audio.wavio import read_wav

        n = 0
        for spk in sorted(os.listdir(wav_root)):
            sdir = os.path.join(wav_root, spk)
            if not os.path.isdir(sdir):
                continue
            odir = os.path.join(out_root, spk)
            os.makedirs(odir, exist_ok=True)
            for name in sorted(os.listdir(sdir)):
                if not name.endswith(".wav"):
                    continue
                wav, wav_sr = read_wav(os.path.join(sdir, name))
                frames = ge2e_mel_frames(wav, wav_sr)
                for i in range(0, len(frames) - GE2E_PARTIAL_FRAMES + 1,
                               GE2E_PARTIAL_FRAMES // 2):
                    part = frames[i: i + GE2E_PARTIAL_FRAMES]
                    np.save(os.path.join(
                        odir, f"{name[:-4]}_{i:06d}.npy"), part)
                    n += 1
        return n

    def sample_batch(self, rng: np.random.RandomState, S: int, U: int):
        """(S*U, 160, 40) batch; speakers drawn without replacement,
        utterances with replacement when a speaker has < U partials."""
        S = min(S, len(self.speakers))
        spk_idx = rng.choice(len(self.speakers), S, replace=False)
        mels = []
        for si in spk_idx:
            s = self.speakers[si]
            files = self.files[s]
            pick = rng.choice(len(files), U, replace=len(files) < U)
            for fi in pick:
                mels.append(np.load(os.path.join(self.root, s, files[fi])))
        return np.stack(mels).astype(np.float32), S, U


def make_ge2e_train_step(model: GE2EEncoder, tx: optax.GradientTransformation,
                         S: int, U: int, cfg: GE2ETrainConfig):
    def loss_fn(params, mels):
        embeds = model.apply({"params": params["encoder"]}, mels)
        embeds = embeds.reshape(S, U, -1)
        return ge2e_loss(embeds, params["sim_weight"], params["sim_bias"])

    def step(params, opt_state, mels):
        loss, grads = jax.value_and_grad(loss_fn)(params, mels)
        # reference do_gradient_ops: scale similarity grads, clip global norm
        grads = dict(grads)
        grads["sim_weight"] = grads["sim_weight"] * cfg.sim_grad_scale
        grads["sim_bias"] = grads["sim_bias"] * cfg.sim_grad_scale
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, cfg.clip_norm / (gnorm + 1e-6))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, gnorm

    return jax.jit(step)


def ge2e_verification_eer(model: GE2EEncoder, params,
                          ds: "SpeakerVerificationDataset",
                          max_per_speaker: int = 20,
                          seed: int = 0) -> float:
    """Unseen-speaker verification EER over partial embeddings.

    Scores every same-speaker pair against every cross-speaker pair by
    cosine; the equal-error-rate is where false-accept == false-reject.
    The reference never validates its encoder (ge2e_encoder/train.py has
    no eval loop) — on 10-speaker synthetic corpora the encoder
    memorizes (loss 3e-4) and collapses on held-out voices, so training
    here early-stops on this metric instead."""
    rng = np.random.RandomState(seed)
    embeds, labels = [], []
    for si, s in enumerate(ds.speakers):
        files = ds.files[s]
        if not files:
            # a validation speaker with zero .npy partials is a data-
            # layout problem; skip it loudly instead of crashing inside
            # rng.choice/np.stack mid-training
            print(f"ge2e_verification_eer: speaker {s!r} has no partial "
                  f"files under {ds.root} — skipped")
            continue
        pick = rng.choice(len(files), min(max_per_speaker, len(files)),
                          replace=False)
        mels = np.stack([np.load(os.path.join(ds.root, s, files[i]))
                         for i in pick]).astype(np.float32)
        e = np.array(model.apply({"params": params["encoder"]}, mels))
        e /= np.linalg.norm(e, axis=1, keepdims=True) + 1e-12
        embeds.append(e)
        labels.extend([si] * len(e))
    if len(embeds) < 2:
        raise ValueError(
            "ge2e_verification_eer needs >= 2 validation speakers with "
            f"partial files; got {len(embeds)} (root={ds.root})")
    E = np.concatenate(embeds)
    y = np.asarray(labels)
    sim = E @ E.T
    iu = np.triu_indices(len(E), k=1)
    scores = sim[iu]
    same = (y[iu[0]] == y[iu[1]])
    pos = np.sort(scores[same])
    neg = np.sort(scores[~same])
    # EER: threshold sweep over the union of scores
    thr = np.unique(scores)
    far = 1.0 - np.searchsorted(neg, thr, side="right") / max(len(neg), 1)
    frr = np.searchsorted(pos, thr, side="left") / max(len(pos), 1)
    k = int(np.argmin(np.abs(far - frr)))
    return float((far[k] + frr[k]) / 2.0)


def init_ge2e_train(seed: int = 0, lr: float = 1e-4):
    model = GE2EEncoder()
    enc_params = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, GE2E_PARTIAL_FRAMES, GE2E_MEL_CHANNELS)))["params"]
    params = {
        "encoder": enc_params,
        # fixed initial scaling (ge2e_encoder/model.py:27-28)
        "sim_weight": jnp.asarray(10.0),
        "sim_bias": jnp.asarray(-5.0),
    }
    tx = optax.adam(lr)
    return model, params, tx, tx.init(params)


def train_ge2e(data_root: str, out_dir: str, total_steps: int = 100,
               cfg: GE2ETrainConfig | None = None, seed: int = 0,
               log_every: int = 10, val_speakers: int = 0,
               eval_every: int = 500, patience: int = 4):
    """Compact training driver; returns final (or best-EER) params.

    ``val_speakers`` > 0 reserves the LAST N speakers of ``data_root``
    for unseen-speaker verification EER: those speakers are excluded
    from training batches, evaluated every ``eval_every`` steps, and
    the params with the best EER are kept (early stop after
    ``patience`` evaluations without improvement)."""
    cfg = cfg or GE2ETrainConfig()
    all_spk = SpeakerVerificationDataset(data_root).speakers
    val_ds = None
    train_spk = None
    if val_speakers > 0:
        if val_speakers < 2:
            # EER needs cross-speaker (negative) pairs; with one val
            # speaker every threshold scores FAR=1.0, the first eval's
            # params are "best" forever and early stop silently
            # discards all later training
            raise ValueError(
                f"val_speakers={val_speakers}: verification EER needs "
                ">=2 held-out speakers (no negative pairs otherwise)")
        if val_speakers >= len(all_spk) - 1:
            raise ValueError(
                f"val_speakers={val_speakers} leaves <2 train speakers "
                f"(corpus has {len(all_spk)})")
        train_spk = all_spk[:-val_speakers]
        val_ds = SpeakerVerificationDataset(data_root, all_spk[-val_speakers:])
    ds = SpeakerVerificationDataset(data_root, train_spk)
    S = min(cfg.speakers_per_batch, len(ds.speakers))
    U = cfg.utterances_per_speaker
    model, params, tx, opt_state = init_ge2e_train(seed, cfg.learning_rate)
    step_fn = make_ge2e_train_step(model, tx, S, U, cfg)
    rng = np.random.RandomState(seed)
    best_eer, best_params, stale = float("inf"), None, 0
    for step in range(1, total_steps + 1):
        mels, S_, U_ = ds.sample_batch(rng, S, U)
        params, opt_state, loss, gnorm = step_fn(params, opt_state,
                                                 jnp.asarray(mels))
        if step % log_every == 0 or step == total_steps:
            print(f"ge2e step {step}: loss={float(loss):.4f} "
                  f"gnorm={float(gnorm):.3f}", flush=True)
        if val_ds is not None and (step % eval_every == 0
                                   or step == total_steps):
            eer = ge2e_verification_eer(model, params, val_ds)
            marker = ""
            if eer < best_eer - 1e-4:
                best_eer, stale = eer, 0
                best_params = jax.tree_util.tree_map(np.asarray, params)
                marker = "  (best)"
            else:
                stale += 1
            print(f"ge2e step {step}: val_eer={eer:.4f}{marker}", flush=True)
            if stale >= patience:
                print(f"ge2e early stop at {step} "
                      f"(best val_eer={best_eer:.4f})", flush=True)
                break
    if best_params is not None:
        params = best_params
        print(f"ge2e: keeping best-EER params (val_eer={best_eer:.4f})",
              flush=True)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        flat = jax.tree_util.tree_map(np.asarray, params)
        np.save(os.path.join(out_dir, "ge2e_params.npy"),
                np.asarray([flat], dtype=object), allow_pickle=True)
    return params

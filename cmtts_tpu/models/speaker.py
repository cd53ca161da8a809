"""Speaker embedders, TPU-native: GE2E (LSTM) and DeepSpeaker (ResCNN).

Re-designs of the reference sidecar embedders used for multi-speaker and
zero-shot conditioning:

- GE2E: 3-layer LSTM(40) -> last hidden -> Linear(256) -> ReLU -> L2 norm
  (reference ``ge2e_encoder/model.py:12-62``); GE2E softmax loss over the
  scaled similarity matrix (``:63-135``); partial-utterance inference with
  overlapping 160-frame windows (``ge2e_encoder/inference.py:58-155``).
- DeepSpeaker: Keras ResCNN — 4 stages of (Conv2D 5x5 stride-2 + BN +
  clipped ReLU + 3 identity blocks), temporal mean over (T/16, F/16*512)
  features, Dense(512), L2 norm (``deepspeaker/conv_models.py:22-137``);
  64-fbank 160-frame input slices (``deepspeaker/constants.py``).

Both run batched under jit on TPU — the reference runs them one
utterance at a time on CPU/GPU at preprocess time.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

GE2E_MEL_CHANNELS = 40
GE2E_PARTIAL_FRAMES = 160
GE2E_SAMPLING_RATE = 22050
GE2E_WINDOW_MS = 25
GE2E_STEP_MS = 10

DS_NUM_FRAMES = 160
DS_NUM_FBANKS = 64


# --------------------------------------------------------------------------
# GE2E
# --------------------------------------------------------------------------
class GE2EEncoder(nn.Module):
    """3-layer LSTM speaker encoder (ge2e_encoder/model.py:17-28)."""

    hidden: int = 256
    embedding: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, mels: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 40) mel frames -> (B, 256) L2-normalized embeddings."""
        x = mels
        h_last = None
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden, name=f"lstm_{i}")
            carry, x = nn.RNN(cell, return_carry=True, name=f"rnn_{i}")(x)
            h_last = carry[1]  # flax carry = (c, h)
        emb = jax.nn.relu(nn.Dense(self.embedding, name="proj")(h_last))
        return emb / (jnp.linalg.norm(emb, axis=1, keepdims=True) + 1e-5)


def ge2e_similarity_matrix(embeds: jnp.ndarray, weight, bias) -> jnp.ndarray:
    """Scaled GE2E similarity matrix (ge2e_encoder/model.py:63-105),
    vectorized (the reference loops over speakers).

    embeds: (S, U, E) L2-normalized -> (S, U, S)
    """
    S, U, E = embeds.shape
    centroids_incl = embeds.mean(axis=1)
    centroids_incl = centroids_incl / (
        jnp.linalg.norm(centroids_incl, axis=1, keepdims=True) + 1e-5)
    centroids_excl = (embeds.sum(axis=1, keepdims=True) - embeds) / (U - 1)
    centroids_excl = centroids_excl / (
        jnp.linalg.norm(centroids_excl, axis=2, keepdims=True) + 1e-5)

    sim = jnp.einsum("sue,ke->suk", embeds, centroids_incl)
    own = jnp.einsum("sue,sue->su", embeds, centroids_excl)
    eye = jnp.eye(S, dtype=bool)[:, None, :]
    sim = jnp.where(eye, own[:, :, None], sim)
    return sim * weight + bias


def ge2e_loss(embeds: jnp.ndarray, weight, bias) -> jnp.ndarray:
    """GE2E softmax loss (ge2e_encoder/model.py:107-123)."""
    S, U, _ = embeds.shape
    sim = ge2e_similarity_matrix(embeds, weight, bias).reshape(S * U, S)
    target = jnp.repeat(jnp.arange(S), U)
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -logp[jnp.arange(S * U), target].mean()


def compute_partial_slices(n_samples: int, partial_frames: int = GE2E_PARTIAL_FRAMES,
                           min_pad_coverage: float = 0.75, overlap: float = 0.5):
    """Overlapping partial-utterance windows
    (ge2e_encoder/inference.py:58-108)."""
    assert 0 <= overlap < 1 and 0 < min_pad_coverage <= 1
    samples_per_frame = int(GE2E_SAMPLING_RATE * GE2E_STEP_MS / 1000)
    n_frames = int(np.ceil((n_samples + 1) / samples_per_frame))
    frame_step = max(int(np.round(partial_frames * (1 - overlap))), 1)

    wav_slices, mel_slices = [], []
    steps = max(1, n_frames - partial_frames + frame_step + 1)
    for i in range(0, steps, frame_step):
        mel_range = np.array([i, i + partial_frames])
        wav_range = mel_range * samples_per_frame
        mel_slices.append(slice(*mel_range))
        wav_slices.append(slice(*wav_range))

    last = wav_slices[-1]
    coverage = (n_samples - last.start) / (last.stop - last.start)
    if coverage < min_pad_coverage and len(mel_slices) > 1:
        mel_slices, wav_slices = mel_slices[:-1], wav_slices[:-1]
    return wav_slices, mel_slices


def ge2e_mel_frames(wav: np.ndarray, sr: int = GE2E_SAMPLING_RATE) -> np.ndarray:
    """40-channel mel POWER spectrogram frames, 25 ms window / 10 ms hop —
    librosa.feature.melspectrogram semantics (power=2, no log), as the
    reference feeds the encoder (ge2e_encoder/audio.py:53-65)."""
    from cmtts_tpu.audio.stft import mel_filterbank, stft_magnitudes

    n_fft = int(sr * GE2E_WINDOW_MS / 1000)
    hop = int(sr * GE2E_STEP_MS / 1000)
    mag = stft_magnitudes(wav.astype(np.float32), n_fft=n_fft,
                          win_length=n_fft, hop_length=hop, center=True)
    basis = mel_filterbank(sr, n_fft, GE2E_MEL_CHANNELS, fmin=0.0, fmax=sr / 2)
    return np.asarray((mag ** 2) @ basis.T, dtype=np.float32)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def normalize_volume(wav: np.ndarray, target_dBFS: float = -30.0,
                     increase_only=False, decrease_only=False) -> np.ndarray:
    """(ge2e_encoder/audio.py:111-120)"""
    rms = np.sqrt(np.mean((wav * 32767) ** 2)) + 1e-9
    dBFS_change = target_dBFS - 20 * np.log10(rms / 32767 + 1e-12)
    if (dBFS_change < 0 and increase_only) or (dBFS_change > 0 and decrease_only):
        return wav
    return wav * (10 ** (dBFS_change / 20))


def trim_silences_energy(wav: np.ndarray, sr: int = GE2E_SAMPLING_RATE,
                         threshold_db: float = -40.0,
                         window_ms: int = 30) -> np.ndarray:
    """Energy-threshold VAD. The reference uses webrtcvad
    (ge2e_encoder/audio.py:68-108), unavailable in this environment;
    this moving-average energy gate is a documented approximation."""
    win = max(1, int(sr * window_ms / 1000))
    n = (len(wav) // win) * win
    if n == 0:
        return wav
    frames = wav[:n].reshape(-1, win)
    rms = np.sqrt((frames ** 2).mean(axis=1)) + 1e-12
    db = 20 * np.log10(rms / (np.abs(wav).max() + 1e-9) + 1e-12)
    voiced = db > threshold_db
    # smooth with a width-8 moving average (reference vad_moving_average_width)
    # NB np.convolve(mode="same") returns max(len(input), len(kernel)) —
    # skip smoothing when the clip has fewer windows than the kernel
    kernel = np.ones(8) / 8
    if len(voiced) >= len(kernel):
        voiced = np.convolve(voiced.astype(np.float32), kernel,
                             mode="same") > 0.5
    mask = np.repeat(voiced, win)
    out = wav[:n][mask]
    return out if len(out) > 0 else wav


class GE2EInference:
    """Partial-utterance embedding (ge2e_encoder/inference.py:110-155)."""

    def __init__(self, params, hidden=256, embedding=256, num_layers=3):
        self.model = GE2EEncoder(hidden, embedding, num_layers)
        self.params = params
        self._jit = jax.jit(
            lambda p, m: self.model.apply({"params": p}, m))

    def embed_frames_batch(self, frames: np.ndarray) -> np.ndarray:
        return np.asarray(self._jit(self.params, jnp.asarray(frames)))

    def embed_utterance(self, wav: np.ndarray, using_partials: bool = True,
                        preprocess: bool = True) -> np.ndarray:
        if preprocess:
            wav = normalize_volume(np.asarray(wav, np.float32), -30.0,
                                   increase_only=True)
            wav = trim_silences_energy(wav)
        if not using_partials:
            frames = ge2e_mel_frames(wav)
            return self.embed_frames_batch(frames[None])[0]
        wav_slices, mel_slices = compute_partial_slices(len(wav))
        max_len = wav_slices[-1].stop
        if max_len >= len(wav):
            wav = np.pad(wav, (0, max_len - len(wav)))
        frames = ge2e_mel_frames(wav)
        batch = np.stack([frames[s] for s in mel_slices])
        partials = self.embed_frames_batch(batch)
        raw = partials.mean(axis=0)
        return raw / (np.linalg.norm(raw) + 1e-12)


def convert_torch_ge2e(state_dict: dict, hidden=256, embedding=256,
                       num_layers=3) -> dict:
    """torch ``SpeakerEncoder.state_dict()`` (ge2e_encoder/model.py;
    ``encoder.pt`` checkpoint key 'model_state') -> GE2EEncoder params.

    torch LSTM packs gates (i, f, g, o) rows in weight_ih_l{k} (4H, in);
    flax OptimizedLSTMCell keeps one fused Dense for input (``ii``..) and
    hidden (``hi``..) per gate... OptimizedLSTMCell uses a single
    DenseGeneral per source with features 4H in gate order (i, f, g, o).
    """
    params: dict = {}
    for k in range(num_layers):
        w_ih = np.asarray(state_dict[f"lstm.weight_ih_l{k}"])   # (4H, in)
        w_hh = np.asarray(state_dict[f"lstm.weight_hh_l{k}"])   # (4H, H)
        b = (np.asarray(state_dict[f"lstm.bias_ih_l{k}"])
             + np.asarray(state_dict[f"lstm.bias_hh_l{k}"]))    # (4H,)
        H = hidden
        gates = {"i": slice(0, H), "f": slice(H, 2 * H),
                 "g": slice(2 * H, 3 * H), "o": slice(3 * H, 4 * H)}
        cell: dict = {}
        for gname, sl in gates.items():
            cell[f"i{gname}"] = {"kernel": w_ih[sl].T}
            cell[f"h{gname}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
        params[f"lstm_{k}"] = cell
    params["proj"] = {"kernel": np.asarray(state_dict["linear.weight"]).T,
                      "bias": np.asarray(state_dict["linear.bias"])}
    return params


def load_torch_ge2e(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_torch_ge2e(sd)


# --------------------------------------------------------------------------
# DeepSpeaker
# --------------------------------------------------------------------------
def clipped_relu(x):
    return jnp.clip(x, 0.0, 20.0)


class DSIdentityBlock(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.filters, (3, 3), padding="SAME", name="conv_a")(x)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn_a")(h)
        h = clipped_relu(h)
        h = nn.Conv(self.filters, (3, 3), padding="SAME", name="conv_b")(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn_b")(h)
        h = clipped_relu(h)
        return clipped_relu(h + x)


class DSConvResStage(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, (5, 5), strides=(2, 2), padding="SAME",
                    name="conv")(x)
        # keras BatchNormalization epsilon default (conv_models.py BN layers)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn")(x)
        x = clipped_relu(x)
        for i in range(3):
            x = DSIdentityBlock(self.filters, name=f"res_{i}")(x, train)
        return x


class DeepSpeakerResCNN(nn.Module):
    """ResCNN speaker embedder (deepspeaker/conv_models.py:22-137)."""

    embedding: int = 512

    @nn.compact
    def __call__(self, fbanks: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, 160, 64, 1) fbank slices -> (B, 512) L2-normalized."""
        x = fbanks
        for i, f in enumerate((64, 128, 256, 512)):
            x = DSConvResStage(f, name=f"stage_{i}")(x, train)
        B, T, F_, C = x.shape
        x = x.reshape(B, T, F_ * C)          # (B, T/16, 2048)
        x = x.mean(axis=1)                   # temporal average
        x = nn.Dense(self.embedding, name="affine")(x)
        # K.l2_normalize: x * rsqrt(max(sum(x^2), 1e-12))
        return x * jax.lax.rsqrt(
            jnp.maximum((x * x).sum(axis=1, keepdims=True), 1e-12))


def ds_fbank_frames(wav: np.ndarray, sr: int = 22050,
                    win_length: int = 551) -> np.ndarray:
    """64-fbank features a la python_speech_features
    (deepspeaker/audio_ds.py:118-124): 25 ms window, 10 ms hop,
    per-utterance mean/std normalization."""
    from cmtts_tpu.audio.stft import mel_filterbank, stft_magnitudes

    hop = int(sr * 0.01)
    win = int(sr * 0.025)
    n_fft = _next_pow2(win)
    mag = stft_magnitudes(wav.astype(np.float32), n_fft=n_fft, win_length=win,
                          hop_length=hop, center=True)
    basis = mel_filterbank(sr, n_fft, DS_NUM_FBANKS, fmin=0.0, fmax=sr / 2)
    feat = (mag ** 2) @ basis.T
    feat = np.log(np.maximum(feat, 1e-10))
    mu, sigma = feat.mean(axis=0), feat.std(axis=0) + 1e-9
    return ((feat - mu) / sigma).astype(np.float32)


def ds_sample_frames(frames: np.ndarray, num_frames: int = DS_NUM_FRAMES,
                     rng: np.random.RandomState | None = None) -> np.ndarray:
    """Pad or crop to a fixed 160-frame slice
    (deepspeaker/audio_ds.py:126-136)."""
    if len(frames) >= num_frames:
        start = 0 if rng is None else rng.randint(0, len(frames) - num_frames + 1)
        return frames[start: start + num_frames]
    reps = int(np.ceil(num_frames / len(frames)))
    return np.tile(frames, (reps, 1))[:num_frames]


class DeepSpeakerInference:
    """predict_embedding equivalent (deepspeaker/embedding.py:13-27)."""

    def __init__(self, params, batch_stats=None):
        self.model = DeepSpeakerResCNN()
        self.variables = {"params": params}
        if batch_stats is not None:
            self.variables["batch_stats"] = batch_stats
        self._jit = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    def predict_embedding(self, wav: np.ndarray, sr: int = 22050) -> np.ndarray:
        frames = ds_sample_frames(ds_fbank_frames(wav, sr))
        x = frames[None, :, :, None]
        return np.asarray(self._jit(self.variables, jnp.asarray(x)))[0]


def convert_keras_deepspeaker_h5(h5_path: str) -> tuple[dict, dict]:
    """Keras ResCNN .h5 checkpoint -> (params, batch_stats).

    Keras Conv2D kernel (kh, kw, in, out) matches flax; BN stores
    gamma/beta/moving_mean/moving_variance.
    """
    import h5py

    f = h5py.File(h5_path, "r")
    root = f["model_weights"] if "model_weights" in f else f

    def g(layer, name):
        grp = root[layer]
        while not isinstance(grp, h5py.Dataset) and name not in grp:
            keys = list(grp.keys())
            if len(keys) != 1:
                break
            grp = grp[keys[0]]
        return np.asarray(grp[name])

    params: dict = {}
    stats: dict = {}
    stage_filters = (64, 128, 256, 512)
    for i, filt in enumerate(stage_filters):
        conv_name = f"conv{filt}-s"
        sp: dict = {"conv": {"kernel": g(conv_name, "kernel:0"),
                             "bias": g(conv_name, "bias:0")}}
        sb: dict = {}
        bn = conv_name + "_bn"
        sp["bn"] = {"scale": g(bn, "gamma:0"), "bias": g(bn, "beta:0")}
        sb["bn"] = {"mean": g(bn, "moving_mean:0"),
                    "var": g(bn, "moving_variance:0")}
        for b in range(3):
            base = f"res{i+1}_{b}_branch"
            rp = {
                "conv_a": {"kernel": g(base + "_2a", "kernel:0"),
                           "bias": g(base + "_2a", "bias:0")},
                "bn_a": {"scale": g(base + "_2a_bn", "gamma:0"),
                         "bias": g(base + "_2a_bn", "beta:0")},
                "conv_b": {"kernel": g(base + "_2b", "kernel:0"),
                           "bias": g(base + "_2b", "bias:0")},
                "bn_b": {"scale": g(base + "_2b_bn", "gamma:0"),
                         "bias": g(base + "_2b_bn", "beta:0")},
            }
            rb = {
                "bn_a": {"mean": g(base + "_2a_bn", "moving_mean:0"),
                         "var": g(base + "_2a_bn", "moving_variance:0")},
                "bn_b": {"mean": g(base + "_2b_bn", "moving_mean:0"),
                         "var": g(base + "_2b_bn", "moving_variance:0")},
            }
            sp[f"res_{b}"] = rp
            sb[f"res_{b}"] = rb
        params[f"stage_{i}"] = sp
        stats[f"stage_{i}"] = sb
    params["affine"] = {"kernel": g("affine", "kernel:0"),
                        "bias": g("affine", "bias:0")}
    f.close()
    return params, stats


# --------------------------------------------------------------------------
# Unified wrapper (reference model/speaker_embedder.py:11-42 and
# speakerembedder/speaker_embedder.py:16-53)
# --------------------------------------------------------------------------
def load_ge2e_params(ckpt_path: str | None):
    """GE2E encoder params from any supported source: the in-repo
    trainer's ``.npy`` (train/ge2e_trainer.py — ``{"encoder": params,
    "sim_weight", "sim_bias"}``), a torch ``.pt`` state_dict, or
    random-init when no checkpoint is given."""
    if ckpt_path and ckpt_path.endswith(".npy"):
        blob = np.load(ckpt_path, allow_pickle=True)[0]
        return blob["encoder"]
    if ckpt_path:
        return load_torch_ge2e(ckpt_path)
    model = GE2EEncoder()
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, GE2E_PARTIAL_FRAMES,
                                 GE2E_MEL_CHANNELS)))["params"]


class PreDefinedEmbedder:
    """Preprocess-time speaker embedder selected by config
    (``preprocess.yaml speaker_embedder: DeepSpeaker | GE2E``)."""

    def __init__(self, cfg, ckpt_path: str | None = None):
        self.embedder_type = cfg.model.speaker_embedder
        self.sampling_rate = cfg.stft.sampling_rate
        if self.embedder_type == "DeepSpeaker":
            if ckpt_path:
                params, stats = convert_keras_deepspeaker_h5(ckpt_path)
            else:
                model = DeepSpeakerResCNN()
                v = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, DS_NUM_FRAMES, DS_NUM_FBANKS, 1)))
                params, stats = v["params"], v.get("batch_stats")
            self._impl = DeepSpeakerInference(params, stats)
        elif self.embedder_type == "GE2E":
            self._impl = GE2EInference(load_ge2e_params(ckpt_path))
        else:
            raise ValueError(f"unknown speaker embedder {self.embedder_type}")

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        if self.embedder_type == "DeepSpeaker":
            return self._impl.predict_embedding(wav, self.sampling_rate)
        return self._impl.embed_utterance(wav)


def get_deep_speaker_emb(wav: np.ndarray, cfg, ckpt_path: str | None = None):
    """On-the-fly embedding for zero-shot synthesis.  The reference
    imports this from ``speakerembedder`` but never defines it
    (synthesize_zeroshot_lj.py:14, SURVEY §2.1) — supplied here."""
    return PreDefinedEmbedder(cfg, ckpt_path)(wav)

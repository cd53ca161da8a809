"""MOS predictors (reference ``metrics/mos.py`` + ``metrics/mb_model.py``).

MBNet's MeanNet (the part ``get_mb_mos`` uses: conv stack -> BLSTM ->
MLP over |STFT| frames) is reimplemented in flax with a torch-checkpoint
converter.  The pretrained weights (``model-50000.pt``) are a
missing-large-blob in the reference snapshot — without them the loader
raises an informative error.  LDNet lives in
:mod:`cmtts_tpu.metrics.ldnet` (flax port + converter); ``get_ld_mos``
loads it from a local (config.yml, model.pt) pair — the reference
hardcodes developer-machine paths (metrics/mos.py:30-31).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MBNetMeanNet(nn.Module):
    """MBNet mean-score network (metrics/mb_model.py:6-41, 69-77,
    only_mean_inference :113-125)."""

    @nn.compact
    def __call__(self, spec, train: bool = False):
        """spec (B, T, 257) |STFT| frames -> per-frame scores (B, T)."""
        x = spec[..., None]                      # (B, T, 257, 1) NHWC
        ch = (16, 32, 64, 128)
        for s, c in enumerate(ch):
            x = nn.Conv(c, (3, 3), padding="SAME", name=f"conv_{s}_0")(x)
            x = nn.Conv(c, (3, 3), padding="SAME", name=f"conv_{s}_1")(x)
            x = nn.Conv(c, (3, 3), strides=(1, 3), padding="SAME",
                        name=f"conv_{s}_2")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn_{s}")(x)
            x = nn.relu(x)
        B, T = x.shape[0], x.shape[1]
        x = x.reshape(B, T, -1)                  # (B, T, 4*128=512)
        fwd = nn.RNN(nn.OptimizedLSTMCell(128, name="lstm_fwd"),
                     name="rnn_fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(128, name="lstm_bwd"),
                     reverse=True, keep_order=True, name="rnn_bwd")(x)
        x = jnp.concatenate([fwd, bwd], axis=-1)  # (B, T, 256)
        x = nn.relu(nn.Dense(128, name="dnn_0")(x))
        x = nn.relu(nn.Dense(1, name="dnn_1")(x))
        return x[..., 0]


def _lstm_cell_params(sd, prefix, hidden):
    w_ih = np.asarray(sd[f"{prefix}.weight_ih_l0"])
    w_hh = np.asarray(sd[f"{prefix}.weight_hh_l0"])
    b = np.asarray(sd[f"{prefix}.bias_ih_l0"]) + np.asarray(
        sd[f"{prefix}.bias_hh_l0"])
    gates = {"i": slice(0, hidden), "f": slice(hidden, 2 * hidden),
             "g": slice(2 * hidden, 3 * hidden),
             "o": slice(3 * hidden, 4 * hidden)}
    cell = {}
    for gname, sl in gates.items():
        cell[f"i{gname}"] = {"kernel": w_ih[sl].T}
        cell[f"h{gname}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    return cell


def convert_torch_mbnet(state_dict: dict) -> tuple[dict, dict]:
    """Reference MBNet state_dict -> (params, batch_stats) for the
    flax MeanNet.  Torch Conv2d (out,in,kh,kw) -> flax (kh,kw,in,out);
    the mean_net_conv Sequential indexes convs at 0,1,2 / 6,7,8 /
    12,13,14 / 18,19,20 and BNs at 4,10,16,22."""
    sd = state_dict
    conv_idx = [(0, 1, 2), (6, 7, 8), (12, 13, 14), (18, 19, 20)]
    bn_idx = [4, 10, 16, 22]
    params: dict = {}
    stats: dict = {}
    for s, (c0, c1, c2) in enumerate(conv_idx):
        for j, ci in enumerate((c0, c1, c2)):
            w = np.asarray(sd[f"mean_net_conv.{ci}.weight"])
            params[f"conv_{s}_{j}"] = {
                "kernel": w.transpose(2, 3, 1, 0),
                "bias": np.asarray(sd[f"mean_net_conv.{ci}.bias"])}
        bi = bn_idx[s]
        params[f"bn_{s}"] = {
            "scale": np.asarray(sd[f"mean_net_conv.{bi}.weight"]),
            "bias": np.asarray(sd[f"mean_net_conv.{bi}.bias"])}
        stats[f"bn_{s}"] = {
            "mean": np.asarray(sd[f"mean_net_conv.{bi}.running_mean"]),
            "var": np.asarray(sd[f"mean_net_conv.{bi}.running_var"])}
    params["lstm_fwd"] = _lstm_cell_params(sd, "mean_net_rnn", 128)
    # torch bidirectional LSTM stores reverse weights with _reverse suffix
    bwd = {}
    w_ih_r = np.asarray(sd["mean_net_rnn.weight_ih_l0_reverse"])
    w_hh_r = np.asarray(sd["mean_net_rnn.weight_hh_l0_reverse"])
    b_r = np.asarray(sd["mean_net_rnn.bias_ih_l0_reverse"]) + np.asarray(
        sd["mean_net_rnn.bias_hh_l0_reverse"])
    gates = {"i": slice(0, 128), "f": slice(128, 256),
             "g": slice(256, 384), "o": slice(384, 512)}
    for gname, sl in gates.items():
        bwd[f"i{gname}"] = {"kernel": w_ih_r[sl].T}
        bwd[f"h{gname}"] = {"kernel": w_hh_r[sl].T, "bias": b_r[sl]}
    params["lstm_bwd"] = bwd
    params["dnn_0"] = {"kernel": np.asarray(sd["mean_net_dnn.0.weight"]).T,
                       "bias": np.asarray(sd["mean_net_dnn.0.bias"])}
    params["dnn_1"] = {"kernel": np.asarray(sd["mean_net_dnn.3.weight"]).T,
                       "bias": np.asarray(sd["mean_net_dnn.3.bias"])}
    return params, stats


def hamming_spectrum(wav: np.ndarray, sr_unused: int = 22500) -> np.ndarray:
    """|STFT| with a hamming window, n_fft=512 hop=256 — the MOSCal input
    (metrics/mos.py:58-60), frames-major (T, 257)."""
    n_fft, hop = 512, 256
    window = np.hamming(n_fft).astype(np.float32)
    pad = n_fft // 2
    x = np.pad(np.asarray(wav, np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * window[None, :]
    return np.abs(np.fft.rfft(frames, axis=-1)).astype(np.float32)


class MOSCal:
    """MOS predictor harness (metrics/mos.py:11-67).  ``mb_ckpt`` is the
    torch MBNet checkpoint (a missing blob in the reference snapshot);
    ``ld_ckpt``/``ld_config`` point at a local LDNet checkpoint + its
    config.yml (external assets, reference metrics/mos.py:29-37)."""

    def __init__(self, sample_rate: int = 22500, mb_ckpt: str | None = None,
                 ld_ckpt: str | None = None, ld_config: str | None = None):
        self.sample_rate = sample_rate
        self.mb_ckpt = mb_ckpt
        self.ld_ckpt = ld_ckpt
        self.ld_config = ld_config
        self._mb = None
        self._ld = None

    def _load_mb(self):
        if self.mb_ckpt is None:
            raise RuntimeError(
                "MBNet checkpoint unavailable: the reference's "
                "metrics/model-50000.pt is a missing large blob "
                "(.MISSING_LARGE_BLOBS) — pass mb_ckpt= to MOSCal")
        import torch

        sd = torch.load(self.mb_ckpt, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        params, stats = convert_torch_mbnet(sd)
        model = MBNetMeanNet()
        variables = {"params": params, "batch_stats": stats}
        self._mb = jax.jit(lambda spec: model.apply(variables, spec))

    def get_mb_mos(self, wav: np.ndarray) -> float:
        if self._mb is None:
            self._load_mb()
        spec = hamming_spectrum(wav, self.sample_rate)[None]
        scores = self._mb(jnp.asarray(spec))
        return float(np.asarray(scores).mean())

    def _load_ld(self):
        if self.ld_ckpt is None or self.ld_config is None:
            raise RuntimeError(
                "LDNet checkpoint unavailable: the reference loads the "
                "external Pretrained-LDNet-ML-2337 (model-27000.pt + "
                "config.yml, hardcoded developer paths in "
                "metrics/mos.py:30-31) — pass ld_ckpt=/ld_config= to MOSCal")
        import torch
        import yaml

        from cmtts_tpu.metrics.ldnet import LDNet, convert_torch_ldnet

        with open(self.ld_config) as f:
            config = yaml.safe_load(f)
        sd = torch.load(self.ld_ckpt, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        params, stats = convert_torch_ldnet(sd, config)
        model = LDNet(config)
        variables = {"params": params, "batch_stats": stats}
        self._ld = jax.jit(lambda spec: model.apply(
            variables, spec, include_meanspk=False,
            method=LDNet.average_inference))

    def get_ld_mos(self, wav: np.ndarray) -> float:
        """Average-listener LDNet MOS of one waveform (reference
        metrics/mos.py:39-51)."""
        if self._ld is None:
            self._load_ld()
        spec = hamming_spectrum(wav, self.sample_rate)[None]
        scores, _posterior = self._ld(jnp.asarray(spec))
        return float(np.asarray(scores)[0])

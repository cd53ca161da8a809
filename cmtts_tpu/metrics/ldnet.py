"""LDNet MOS predictor (listener-dependent MOS network) in flax.

Parity source: reference ``metrics/ld_model/LDNet.py`` (:10-210),
``modules.py`` (Projection :12-40, MobileNetV2ConvBlocks :68-106,
MobileNetV3ConvBlocks :108-156, STRIDE=3), ``mobilenetv2.py``
(ConvBNActivation :31-55, InvertedResidual :62-100) and
``mobilenetv3.py`` (SqueezeExcitation :20-38, InvertedResidualConfig
:41-56, InvertedResidual :59-97).  Loaded by ``metrics/mos.py:29-37``
from the external ``Pretrained-LDNet-ML-2337`` checkpoint and used via
``average_inference`` in ``all_metrics.py:494-528``.

TPU-native layout: NHWC ``(B, time, freq, C)`` (torch uses NCHW); conv
strides apply to the FREQ axis only (the reference's "stride only
operates on the last axis", mobilenetv2.py:49-50), so the time axis is
preserved end-to-end and the final ``adaptive_avg_pool2d(x, (time, 1))``
reduces to a mean over the frequency axis.

The config dict uses the SAME keys as the torch LDNet so the external
``config.yml`` can be passed through unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

STRIDE = 3  # modules.py:10


def _make_divisible(v: float, divisor: int = 8) -> int:
    """mobilenetv2.py:15-28 channel rounding."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


_ACTS = {
    "relu": nn.relu,
    "relu6": lambda x: jnp.minimum(nn.relu(x), 6.0),
    "hardswish": nn.hard_swish,
    "identity": lambda x: x,
}


class ConvBNAct(nn.Module):
    """ConvBNActivation (mobilenetv2.py:31-55): conv(no bias, stride on
    freq only) -> BatchNorm(eval running stats) -> activation."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: str = "relu6"

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(1, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="bn")(x)
        return _ACTS[self.act](x)


class InvertedResidualV2(nn.Module):
    """mobilenetv2.py:62-100 (expand -> depthwise -> linear project)."""

    inp: int
    oup: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x):
        hidden = int(round(self.inp * self.expand_ratio))
        res = x
        if self.expand_ratio != 1:
            x = ConvBNAct(hidden, kernel=1, name="expand")(x)
        x = ConvBNAct(hidden, kernel=3, stride=self.stride, groups=hidden,
                      name="depthwise")(x)
        x = nn.Conv(self.oup, (1, 1), use_bias=False, name="project")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="project_bn")(x)
        if self.stride == 1 and self.inp == self.oup:
            x = x + res
        return x


class SqueezeExcitation(nn.Module):
    """mobilenetv3.py:20-38: global mean -> fc1 -> relu -> fc2 ->
    hardsigmoid gate."""

    input_channels: int
    squeeze_factor: int = 4

    @nn.compact
    def __call__(self, x):
        squeeze = _make_divisible(self.input_channels // self.squeeze_factor)
        scale = x.mean(axis=(1, 2), keepdims=True)
        scale = nn.Conv(squeeze, (1, 1), name="fc1")(scale)
        scale = nn.relu(scale)
        scale = nn.Conv(self.input_channels, (1, 1), name="fc2")(scale)
        return nn.hard_sigmoid(scale) * x


class InvertedResidualV3(nn.Module):
    """mobilenetv3.py:59-97.  ``cnf`` = (input_channels, kernel,
    expanded_channels, out_channels, use_se, use_hs, stride, dilation),
    channels already width-adjusted (width_mult=1 in LDNet)."""

    cnf: tuple

    @nn.compact
    def __call__(self, x):
        inp, kernel, expanded, out, use_se, use_hs, stride, dilation = self.cnf
        act = "hardswish" if use_hs else "relu"
        res = x
        if expanded != inp:
            x = ConvBNAct(expanded, kernel=1, act=act, name="expand")(x)
        dw_stride = 1 if dilation > 1 else stride
        x = ConvBNAct(expanded, kernel=kernel, stride=dw_stride,
                      groups=expanded, dilation=dilation, act=act,
                      name="depthwise")(x)
        if use_se:
            x = SqueezeExcitation(expanded, name="se")(x)
        x = ConvBNAct(out, kernel=1, act="identity", name="project")(x)
        if stride == 1 and inp == out:
            x = x + res
        return x


class MobileNetV2Encoder(nn.Module):
    """modules.py:68-106: first conv(stride 3 on freq) -> inverted
    residual stages -> 1x1 out conv -> mean over freq -> (B, T, C)."""

    first_ch: int
    t_list: Sequence[int]
    c_list: Sequence[int]
    n_list: Sequence[int]
    s_list: Sequence[int]
    output_dim: int

    @nn.compact
    def __call__(self, spec):
        x = spec[..., None]                       # (B, T, F, 1)
        x = ConvBNAct(self.first_ch, kernel=3, stride=STRIDE,
                      name="first")(x)
        in_ch = self.first_ch
        idx = 0
        for t, c, n, s in zip(self.t_list, self.c_list, self.n_list,
                              self.s_list):
            for i in range(n):
                stride = s if i == 0 else 1
                x = InvertedResidualV2(in_ch, c, stride, t,
                                       name=f"block_{idx}")(x)
                in_ch = c
                idx += 1
        x = ConvBNAct(self.output_dim, kernel=1, name="last")(x)
        return x.mean(axis=2)                     # (B, T, C)


class MobileNetV3Encoder(nn.Module):
    """modules.py:108-156: hardswish stem -> v3 bottlenecks -> 1x1
    hardswish out conv -> mean over freq."""

    bneck_confs: tuple                             # raw config rows
    output_dim: int

    @nn.compact
    def __call__(self, spec):
        confs = [_v3_cnf(row) for row in self.bneck_confs]
        x = spec[..., None]
        x = ConvBNAct(confs[0][0], kernel=3, stride=STRIDE, act="hardswish",
                      name="first")(x)
        for i, cnf in enumerate(confs):
            x = InvertedResidualV3(cnf, name=f"block_{i}")(x)
        x = ConvBNAct(self.output_dim, kernel=1, act="hardswish",
                      name="last")(x)
        return x.mean(axis=2)


def _v3_cnf(row) -> tuple:
    """Config row [in, kernel, expanded, out, use_se, act, stride,
    dilation] -> width-adjusted tuple (InvertedResidualConfig with
    width_mult=1, mobilenetv3.py:41-56)."""
    inp, kernel, expanded, out, use_se, act, stride, dilation = row
    return (_make_divisible(inp), int(kernel), _make_divisible(expanded),
            _make_divisible(out), bool(use_se), act == "HS", int(stride),
            int(dilation))


class Projection(nn.Module):
    """modules.py:12-40: Linear -> act -> dropout(0.3) -> Linear; scalar
    output optionally range-clipped to tanh*2+3."""

    hidden_dim: int
    output_type: str
    range_clipping: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = 1 if self.output_type == "scalar" else 5
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = _ACTS[self.activation](x)
        x = nn.Dropout(0.3, deterministic=deterministic)(x)
        x = nn.Dense(out_dim, name="fc2")(x)
        if self.output_type == "scalar" and self.range_clipping:
            return jnp.tanh(x) * 2.0 + 3.0
        return x


class LDNet(nn.Module):
    """LDNet (LDNet.py:10-210) — judge-conditioned MOS predictor.

    ``config`` uses the torch LDNet's key names (external config.yml
    passes through unchanged).
    """

    config: dict

    def setup(self):
        cfg = self.config
        self.num_judges = cfg["num_judges"]
        self.judge_embedding = nn.Embed(cfg["num_judges"],
                                        cfg["judge_emb_dim"],
                                        name="judge_embedding")
        enc = cfg["encoder_type"]
        if enc == "mobilenetv2":
            self.encoder = MobileNetV2Encoder(
                cfg["encoder_conv_first_ch"], tuple(cfg["encoder_conv_t"]),
                tuple(cfg["encoder_conv_c"]), tuple(cfg["encoder_conv_n"]),
                tuple(cfg["encoder_conv_s"]), cfg["encoder_output_dim"],
                name="encoder")
        elif enc == "mobilenetv3":
            self.encoder = MobileNetV3Encoder(
                tuple(tuple(r) for r in cfg["encoder_bneck_configs"]),
                cfg["encoder_output_dim"], name="encoder")
        else:
            raise NotImplementedError(f"encoder_type {enc}")

        if cfg["decoder_type"] == "rnn":
            dim = cfg["decoder_rnn_dim"]
            self.dec_rnn_fwd = nn.RNN(
                nn.OptimizedLSTMCell(dim, name="dec_cell_fwd"),
                name="dec_rnn_fwd")
            self.dec_rnn_bwd = nn.RNN(
                nn.OptimizedLSTMCell(dim, name="dec_cell_bwd"), reverse=True,
                keep_order=True, name="dec_rnn_bwd")
        self.decoder_dnn = Projection(
            cfg["decoder_dnn_dim"], cfg["output_type"],
            cfg["range_clipping"], name="decoder_dnn")

        if cfg["use_mean_net"]:
            if cfg["mean_net_type"] == "rnn":
                dim = cfg["mean_net_rnn_dim"]
                self.mean_rnn_fwd = nn.RNN(
                    nn.OptimizedLSTMCell(dim, name="mean_cell_fwd"),
                    name="mean_rnn_fwd")
                self.mean_rnn_bwd = nn.RNN(
                    nn.OptimizedLSTMCell(dim, name="mean_cell_bwd"),
                    reverse=True, keep_order=True, name="mean_rnn_bwd")
            self.mean_net_dnn = Projection(
                cfg["mean_net_dnn_dim"], cfg["output_type"],
                cfg["mean_net_range_clipping"], name="mean_net_dnn")

    def _decode(self, decoder_inputs):
        if self.config["decoder_type"] == "rnn":
            x = jnp.concatenate([self.dec_rnn_fwd(decoder_inputs),
                                 self.dec_rnn_bwd(decoder_inputs)], axis=-1)
        else:
            x = decoder_inputs
        return self.decoder_dnn(x)

    def _mean_net(self, encoder_outputs):
        if self.config["mean_net_type"] == "rnn":
            x = jnp.concatenate([self.mean_rnn_fwd(encoder_outputs),
                                 self.mean_rnn_bwd(encoder_outputs)], axis=-1)
        else:
            x = encoder_outputs
        return self.mean_net_dnn(x)

    def __call__(self, spectrum, judge_id):
        """(B, T, D) spectrum + (B,) judge ids -> (mean_score, ld_score)
        per frame (LDNet.py:83-124)."""
        B, T, _ = spectrum.shape
        judge_feat = self.judge_embedding(judge_id)          # (B, E)
        judge_feat = jnp.broadcast_to(judge_feat[:, None, :],
                                      (B, T, judge_feat.shape[-1]))
        encoder_outputs = self.encoder(spectrum)             # (B, T, C)
        decoder_inputs = jnp.concatenate([encoder_outputs, judge_feat],
                                         axis=-1)
        mean_score = (self._mean_net(encoder_outputs)
                      if self.config["use_mean_net"] else None)
        ld_score = self._decode(decoder_inputs)
        return mean_score, ld_score

    def mean_listener_inference(self, spectrum):
        """Mean-listener (last judge id) scores (B,) (LDNet.py:126-155)."""
        assert self.config["use_mean_listener"]
        B, T, _ = spectrum.shape
        judge_id = jnp.full((B,), self.num_judges - 1, jnp.int32)
        _, ld_score = self(spectrum, judge_id)
        return ld_score[..., 0].mean(axis=1)

    def average_inference(self, spectrum, include_meanspk: bool = False):
        """Average over all listeners (LDNet.py:157-210):
        returns (scores (B,), posterior_scores (B, nj))."""
        cfg = self.config
        B, T, _ = spectrum.shape
        nj = self.num_judges - (1 if cfg["use_mean_listener"]
                                and not include_meanspk else 0)
        judge_ids = jnp.arange(nj, dtype=jnp.int32)
        judge_feat = self.judge_embedding(judge_ids)          # (nj, E)
        encoder_outputs = self.encoder(spectrum)              # (B, T, C)

        # (B, nj, T, C+E) flattened to (B*nj, T, ·) like LDNet.py:191
        enc = jnp.broadcast_to(encoder_outputs[:, None],
                               (B, nj) + encoder_outputs.shape[1:])
        jf = jnp.broadcast_to(judge_feat[None, :, None, :],
                              (B, nj, T, judge_feat.shape[-1]))
        decoder_inputs = jnp.concatenate([enc, jf], axis=-1)
        flat = decoder_inputs.reshape((B * nj,) + decoder_inputs.shape[2:])
        decoder_outputs = self._decode(flat)
        decoder_outputs = decoder_outputs.reshape(
            (B, nj, T, decoder_outputs.shape[-1]))

        if cfg["output_type"] == "scalar":
            decoder_outputs = decoder_outputs[..., 0]         # (B, nj, T)
            posterior_scores = decoder_outputs.mean(axis=2)
            ld_scores = decoder_outputs.mean(axis=1)          # (B, T)
        else:  # categorical
            post = jax.nn.softmax(decoder_outputs, axis=-1)
            ld = post @ jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
            posterior_scores = ld.mean(axis=2)
            ld_scores = ld.mean(axis=1)
        return ld_scores.mean(axis=1), posterior_scores


# ---------------------------------------------------------------------------
# torch -> flax converter
# ---------------------------------------------------------------------------

def _conv(sd, key, depthwise=False):
    """Torch Conv2d weight (O, I/g, kh, kw) -> flax (kh, kw, I/g, O)."""
    w = np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _bn(sd, key):
    params = {"scale": np.asarray(sd[f"{key}.weight"]),
              "bias": np.asarray(sd[f"{key}.bias"])}
    stats = {"mean": np.asarray(sd[f"{key}.running_mean"]),
             "var": np.asarray(sd[f"{key}.running_var"])}
    return params, stats


def _convbn(sd, key, params, stats, conv_i=0, bn_i=1):
    """Map a torch ConvBNActivation Sequential at ``key`` into a flax
    ConvBNAct subtree."""
    p, s = _bn(sd, f"{key}.{bn_i}")
    params["conv"] = _conv(sd, f"{key}.{conv_i}")
    params["bn"] = p
    stats["bn"] = s


def _lstm_dir(sd, prefix, hidden, suffix=""):
    w_ih = np.asarray(sd[f"{prefix}.weight_ih_l0{suffix}"])
    w_hh = np.asarray(sd[f"{prefix}.weight_hh_l0{suffix}"])
    b = np.asarray(sd[f"{prefix}.bias_ih_l0{suffix}"]) + np.asarray(
        sd[f"{prefix}.bias_hh_l0{suffix}"])
    gates = {"i": slice(0, hidden), "f": slice(hidden, 2 * hidden),
             "g": slice(2 * hidden, 3 * hidden),
             "o": slice(3 * hidden, 4 * hidden)}
    cell = {}
    for gname, sl in gates.items():
        cell[f"i{gname}"] = {"kernel": w_ih[sl].T}
        cell[f"h{gname}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    return cell


def _projection(sd, prefix):
    return {
        "fc1": {"kernel": np.asarray(sd[f"{prefix}.net.0.weight"]).T,
                "bias": np.asarray(sd[f"{prefix}.net.0.bias"])},
        "fc2": {"kernel": np.asarray(sd[f"{prefix}.net.3.weight"]).T,
                "bias": np.asarray(sd[f"{prefix}.net.3.bias"])},
    }


def convert_torch_ldnet(state_dict: dict, config: dict) -> tuple[dict, dict]:
    """Reference LDNet ``state_dict`` (numpy values) + its config dict ->
    (params, batch_stats) for the flax :class:`LDNet`."""
    sd = state_dict
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    params["judge_embedding"] = {
        "embedding": np.asarray(sd["judge_embedding.weight"])}

    enc_p: dict[str, Any] = {}
    enc_s: dict[str, Any] = {}
    if config["encoder_type"] == "mobilenetv2":
        fi = 0  # torch features index
        p, s = {}, {}
        _convbn(sd, f"encoder.features.{fi}", p, s)
        enc_p["first"], enc_s["first"] = p, s
        fi += 1
        idx = 0
        in_ch = config["encoder_conv_first_ch"]
        for t, c, n, s_ in zip(config["encoder_conv_t"],
                               config["encoder_conv_c"],
                               config["encoder_conv_n"],
                               config["encoder_conv_s"]):
            for i in range(n):
                base = f"encoder.features.{fi}.conv"
                bp: dict[str, Any] = {}
                bs: dict[str, Any] = {}
                j = 0
                if t != 1:
                    ep, es = {}, {}
                    _convbn(sd, f"{base}.{j}", ep, es)
                    bp["expand"], bs["expand"] = ep, es
                    j += 1
                dp, ds = {}, {}
                _convbn(sd, f"{base}.{j}", dp, ds)
                bp["depthwise"], bs["depthwise"] = dp, ds
                j += 1
                bp["project"] = _conv(sd, f"{base}.{j}")
                pbn, sbn = _bn(sd, f"{base}.{j + 1}")
                bp["project_bn"], bs["project_bn"] = pbn, sbn
                enc_p[f"block_{idx}"], enc_s[f"block_{idx}"] = bp, bs
                in_ch = c
                idx += 1
                fi += 1
        p, s = {}, {}
        _convbn(sd, f"encoder.features.{fi}", p, s)
        enc_p["last"], enc_s["last"] = p, s
    elif config["encoder_type"] == "mobilenetv3":
        confs = [_v3_cnf(r) for r in config["encoder_bneck_configs"]]
        p, s = {}, {}
        _convbn(sd, "encoder.features.0", p, s)
        enc_p["first"], enc_s["first"] = p, s
        for i, cnf in enumerate(confs):
            inp, kernel, expanded, out, use_se, use_hs, stride, dil = cnf
            base = f"encoder.features.{i + 1}.block"
            bp, bs = {}, {}
            j = 0
            if expanded != inp:
                ep, es = {}, {}
                _convbn(sd, f"{base}.{j}", ep, es)
                bp["expand"], bs["expand"] = ep, es
                j += 1
            dp, ds = {}, {}
            _convbn(sd, f"{base}.{j}", dp, ds)
            bp["depthwise"], bs["depthwise"] = dp, ds
            j += 1
            if use_se:
                bp["se"] = {"fc1": _conv(sd, f"{base}.{j}.fc1"),
                            "fc2": _conv(sd, f"{base}.{j}.fc2")}
                j += 1
            pp, ps = {}, {}
            _convbn(sd, f"{base}.{j}", pp, ps)
            bp["project"], bs["project"] = pp, ps
            enc_p[f"block_{i}"], enc_s[f"block_{i}"] = bp, bs
        p, s = {}, {}
        _convbn(sd, f"encoder.features.{len(confs) + 1}", p, s)
        enc_p["last"], enc_s["last"] = p, s
    else:
        raise NotImplementedError(config["encoder_type"])
    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    if config["decoder_type"] == "rnn":
        dim = config["decoder_rnn_dim"]
        params["dec_cell_fwd"] = _lstm_dir(sd, "decoder_rnn", dim)
        params["dec_cell_bwd"] = _lstm_dir(sd, "decoder_rnn", dim,
                                           suffix="_reverse")
    params["decoder_dnn"] = _projection(sd, "decoder_dnn")

    if config["use_mean_net"]:
        if config["mean_net_type"] == "rnn":
            dim = config["mean_net_rnn_dim"]
            params["mean_cell_fwd"] = _lstm_dir(sd, "mean_net_rnn", dim)
            params["mean_cell_bwd"] = _lstm_dir(sd, "mean_net_rnn", dim,
                                                suffix="_reverse")
        params["mean_net_dnn"] = _projection(sd, "mean_net_dnn")

    return params, stats

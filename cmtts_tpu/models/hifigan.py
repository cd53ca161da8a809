"""HiFi-GAN generator (inference vocoder), TPU-first.

Re-design of the reference vocoder (``hifigan/models.py:112-174``,
``hifigan/config.json``): conv_pre(80->512,k7) -> 4 transposed-conv
upsample stages (rates 8,8,2,2 / kernels 16,16,4,4) each followed by a
multi-receptive-field fusion (mean of 3 ResBlocks, kernels 3/7/11,
dilations (1,3,5) interleaved with dilation-1 convs) -> conv_post -> tanh.
256x upsampling at 22.05 kHz.

TPU-first choices: channels-last layout; transposed convs via
``flax.linen.ConvTranspose`` (lowers to XLA conv with lhs dilation, which
maps onto the MXU); weight-norm is folded into plain kernels at
load/convert time (the reference removes weight norm for inference too,
``utils/model.py:181``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class HiFiGANConfig:
    upsample_rates: tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    sampling_rate: int = 22050

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


class ResBlock(nn.Module):
    """MRF residual block (reference hifigan/models.py:20-103)."""

    channels: int
    kernel_size: int
    dilations: tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                        padding="SAME", name=f"conv1_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(1,),
                        padding="SAME", name=f"conv2_{i}")(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    cfg: HiFiGANConfig = field(default_factory=HiFiGANConfig)

    @nn.compact
    def __call__(self, mel):
        """mel (B, T, n_mels) -> waveform (B, T * 256)."""
        c = self.cfg
        x = nn.Conv(c.upsample_initial_channel, (7,), padding="SAME",
                    name="conv_pre")(mel)
        for i, (rate, kernel) in enumerate(
                zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            # torch ConvTranspose1d(k, stride=u, padding=(k-u)//2) output
            # length = T*u; flax 'SAME' padding reproduces it for k=2u/k=u.
            x = nn.ConvTranspose(ch, (kernel,), strides=(rate,), padding="SAME",
                                 name=f"up_{i}")(x)
            acc = None
            for j, (ks, ds) in enumerate(
                    zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)):
                h = ResBlock(ch, ks, tuple(ds), name=f"res_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(c.resblock_kernel_sizes)
        x = nn.leaky_relu(x, 0.01)  # torch F.leaky_relu default slope
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


def hifigan_apply_fused(params: dict, mel, cfg: HiFiGANConfig | None = None,
                        mrf_pallas_max_c: int | None = None,
                        interpret: bool = False,
                        pallas_dtype=jnp.bfloat16,
                        pallas_dot_dtype=None,
                        stream_stage0: bool | None = None):
    """Functional HiFi-GAN forward with Pallas fused-MRF stages.

    Same math and same param tree as ``HiFiGANGenerator`` — the upsample
    stages with C <= ``mrf_pallas_max_c`` run their entire 18-conv MRF
    in one Pallas kernel (VMEM-resident, x read once; see
    cmtts_tpu.ops.mrf_pallas); the FINAL stage also absorbs the
    generator head (leaky_relu(0.01) -> conv_post -> tanh), whose XLA
    form is an N=1 conv plus two full-waveform-length layout copies.
    ``mrf_pallas_max_c=None`` picks the cap by batch size (measured on
    v5e): single-sample synthesis also fuses the C=128 stage (35.6 vs
    38.4 ms), while batched synthesis stops at C=64 — XLA's batched
    C=128 convs beat the kernel's per-item tile-512 grid there (69.7 vs
    75.1 ms at B=8).

    ``stream_stage0``: stages too wide for VMEM-resident weights
    (C > mrf_pallas_max_c, i.e. stage 0 at C=256) run the
    weight-STREAMING Pallas kernel (``fused_mrf_stage_streamed``, bf16
    weights double-buffered from HBM) instead of the flax/XLA path.
    Default (None) enables it for single-sample synthesis, where it
    cuts the full B=1 T=800 vocoder 1.23x (11.8 -> 9.6 ms, interleaved
    A/B, median of 8 alternating blocks) — measured v5e,
    docs/ROUND3_NOTES.md.

    Precision (v5e, profile-driven): XLA-side ops stay f32 (XLA already
    computes f32 convs with bf16 MXU passes internally); inside the
    Pallas kernels activations are cast to ``pallas_dtype`` (bf16) and
    matmul operands to ``pallas_dot_dtype`` (bf16) with f32 accumulation
    — matching XLA's own conv precision.  The round-1 "bf16 embedded"
    regression came from casting in XLA before the kernel; in-kernel
    casts are clean.
    """
    from cmtts_tpu.ops.mrf_pallas import (
        fused_mrf_stage,
        fused_mrf_stage_streamed,
        pack_mrf_params,
        pack_mrf_params_streamed,
        pack_post_params,
    )

    c = cfg or HiFiGANConfig()
    f32 = jnp.float32
    if mrf_pallas_max_c is None:
        mrf_pallas_max_c = 128 if mel.shape[0] == 1 else 64
    if stream_stage0 is None:
        stream_stage0 = mel.shape[0] == 1
    if pallas_dot_dtype is None:
        pallas_dot_dtype = pallas_dtype
    params = jax.tree_util.tree_map(lambda v: v.astype(f32), params)
    x = nn.Conv(c.upsample_initial_channel, (7,), padding="SAME",
                dtype=f32).apply({"params": params["conv_pre"]},
                                 mel.astype(f32))
    n_stages = len(c.upsample_rates)
    for i, (rate, kernel) in enumerate(
            zip(c.upsample_rates, c.upsample_kernel_sizes)):
        ch = c.upsample_initial_channel // (2 ** (i + 1))
        last = i == n_stages - 1
        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.ConvTranspose(ch, (kernel,), strides=(rate,), padding="SAME",
                             dtype=f32).apply({"params": params[f"up_{i}"]}, x)
        if ch <= mrf_pallas_max_c:
            packed = pack_mrf_params(params, i, ch,
                                     c.resblock_kernel_sizes, f32)
            post = pack_post_params(params, ch, f32) if last else None
            x = fused_mrf_stage(x, packed,
                                c.resblock_kernel_sizes,
                                c.resblock_dilation_sizes[0],
                                interpret=interpret,
                                compute_dtype=pallas_dtype,
                                dot_dtype=pallas_dot_dtype,
                                post_params=post,
                                post_k=int(params["conv_post"]["kernel"]
                                           .shape[0]))
            if last:
                return x  # fused head already applied tanh
        elif stream_stage0 and not last:
            w, b = pack_mrf_params_streamed(params, i, ch,
                                            c.resblock_kernel_sizes)
            x = fused_mrf_stage_streamed(x, w, b,
                                         c.resblock_kernel_sizes,
                                         c.resblock_dilation_sizes[0],
                                         interpret=interpret,
                                         compute_dtype=pallas_dtype,
                                         dot_dtype=pallas_dot_dtype,
                                         # tile=1024 wins at B=1; larger
                                         # grids trip Mosaic's scoped-VMEM
                                         # accounting at W=1280, so stay
                                         # at 512 for explicit B>1 opt-in
                                         tile=1024 if mel.shape[0] == 1
                                         else 512)
        else:
            acc = None
            for j, (ks, ds) in enumerate(
                    zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)):
                h = ResBlock(ch, ks, tuple(ds)).apply(
                    {"params": params[f"res_{i}_{j}"]}, x)
                acc = h if acc is None else acc + h
            x = acc / len(c.resblock_kernel_sizes)
    x = nn.leaky_relu(x, 0.01)
    x = nn.Conv(1, (7,), padding="SAME",
                dtype=f32).apply({"params": params["conv_post"]}, x)
    return jnp.tanh(x)[..., 0]


def _fold_weight_norm(g, v):
    """weight_norm fold: w = g * v / ||v|| over all-but-first dims
    (torch semantics; the reference removes weight norm at inference,
    utils/model.py:181)."""
    import numpy as np

    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return g.reshape(norm.shape) * v / np.maximum(norm, 1e-12)


def unflatten_npz(path: str) -> dict:
    """`a/b/c` flat npz keys -> nested flax params dict (shared by the
    HiFi-GAN and MelGAN loaders)."""
    import numpy as np

    params: dict = {}
    for k, v in dict(np.load(path)).items():
        node = params
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return params


def torch_conv_getters(state_dict: dict):
    """(get, conv_w, convT_w) over a torch vocoder state dict: weight-norm
    fold + torch->flax kernel layout.  Conv1d (out,in,k)->(k,in,out);
    ConvTranspose1d (in,out,k)->(k,in,out) with flipped taps."""
    import numpy as np

    def get(name):
        w = state_dict.get(name)
        return None if w is None else np.asarray(w)

    def conv_w(prefix):
        g, v = get(prefix + ".weight_g"), get(prefix + ".weight_v")
        w = _fold_weight_norm(g, v) if g is not None else get(prefix + ".weight")
        return np.transpose(w, (2, 1, 0))

    def convT_w(prefix):
        g, v = get(prefix + ".weight_g"), get(prefix + ".weight_v")
        w = _fold_weight_norm(g, v) if g is not None else get(prefix + ".weight")
        w = np.transpose(w, (2, 0, 1))
        return w[::-1].copy()

    return get, conv_w, convT_w


def convert_torch_hifigan(state_dict: dict, cfg: HiFiGANConfig) -> dict:
    """Convert a reference HiFi-GAN generator torch state dict
    (hifigan/generator_*.pth.tar ["generator"]) into this module's flax
    params.  Torch Conv1d kernels are (out, in, k); flax wants (k, in, out).
    Torch ConvTranspose1d kernels are (in, out, k) -> flax (k, in, out)
    with flipped taps (transpose conv kernel-flip convention)."""
    get, conv_w, convT_w = torch_conv_getters(state_dict)

    params: dict = {
        "conv_pre": {"kernel": conv_w("conv_pre"), "bias": get("conv_pre.bias")},
        "conv_post": {"kernel": conv_w("conv_post"), "bias": get("conv_post.bias")},
    }
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params[f"up_{i}"] = {"kernel": convT_w(f"ups.{i}"),
                             "bias": get(f"ups.{i}.bias")}
        for j in range(n_k):
            r = i * n_k + j
            block: dict = {}
            for c, d in enumerate(cfg.resblock_dilation_sizes[j]):
                block[f"conv1_{c}"] = {
                    "kernel": conv_w(f"resblocks.{r}.convs1.{c}"),
                    "bias": get(f"resblocks.{r}.convs1.{c}.bias")}
                block[f"conv2_{c}"] = {
                    "kernel": conv_w(f"resblocks.{r}.convs2.{c}"),
                    "bias": get(f"resblocks.{r}.convs2.{c}.bias")}
            params[f"res_{i}_{j}"] = block
    return params


def load_hifigan_params(path: str | None, cfg=None):
    """Load HiFi-GAN generator params from .npz / torch .pth.tar; falls
    back to random init (the pretrained blobs are absent from the
    reference snapshot, .MISSING_LARGE_BLOBS)."""
    import numpy as np

    name = "HiFi-GAN" if cfg is None else getattr(
        cfg.model, "vocoder_model", "HiFi-GAN")
    if name in ("MelGAN", "melgan"):
        # the reference pulls MelGAN from torch.hub (utils/model.py:159-169);
        # no egress here, so the generator loads from a LOCAL checkpoint
        if not path:
            raise FileNotFoundError(
                "MelGAN has no bundled checkpoint (the reference downloads "
                "it via torch.hub; no network egress here) — pass a local "
                "melgan-neurips generator .pt via --vocoder_ckpt")
        from cmtts_tpu.models.melgan import load_melgan_params

        return load_melgan_params(path)
    if name not in ("HiFi-GAN", "hifigan"):
        raise NotImplementedError(f"unknown vocoder '{name}'")
    hcfg = HiFiGANConfig() if cfg is None else HiFiGANConfig(
        num_mels=cfg.stft.n_mel_channels, sampling_rate=cfg.stft.sampling_rate)
    if path and path.endswith(".npz"):
        return unflatten_npz(path)
    if path and (path.endswith(".pt") or path.endswith(".pth.tar")):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("generator", ckpt)
        sd = {k: v.numpy() for k, v in sd.items()}
        return convert_torch_hifigan(sd, hcfg)
    import warnings

    warnings.warn("no vocoder checkpoint given; using random-init HiFi-GAN")
    import jax
    import jax.numpy as jnp

    voc = HiFiGANGenerator(hcfg)
    return voc.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, hcfg.num_mels)))["params"]


def vocoder_infer(wav: jnp.ndarray, mel_lens, hop_length: int = 256,
                  max_wav_value: float = 32768.0):
    """Scale to int16 range and report per-sample lengths (reference
    ``utils/model.py:187-205``).  Returns (int16-scaled float array,
    lengths in samples); host code truncates per sample."""
    import numpy as np

    wavs = np.asarray(wav) * max_wav_value
    wavs = np.clip(wavs, -32768, 32767).astype(np.int16)
    lens = np.asarray(mel_lens) * hop_length
    return wavs, lens

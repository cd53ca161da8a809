"""MelGAN vocoder (the reference's alternative to HiFi-GAN), TPU-first.

The reference pulls MelGAN from torch.hub at runtime
(``utils/model.py:159-169``, repo descriptinc/melgan-neurips) — there is
no checkpoint in the snapshot and no network egress here, so this module
makes the gate about ASSETS, not code: the architecture + torch-state-dict
converter are complete, and any locally provided ``best_netG.pt`` /
``melgan.pt`` loads directly.

Architecture (melgan-neurips ``mel2wav/modules.py`` Generator, ngf=32,
n_residual_layers=3, ratios 8/8/2/2): reflection-padded 7-tap conv_pre ->
4 x [LeakyReLU(0.2), ConvTranspose(k=2r, stride=r), 3 ResnetBlocks with
dilations 3^j] -> LeakyReLU -> reflection-padded 7-tap conv_post -> tanh.
All convs are weight-normed in torch; folded at convert time.

Input convention: the reference feeds ``mel / ln(10)`` (natural-log mels
-> log10, ``utils/model.py:189``); callers here do the same — see
``cmtts_tpu.pipeline.Synthesizer``.  Layout is channels-last (B, T, 80),
output (B, T*256).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.2


@dataclass(frozen=True)
class MelGANConfig:
    ratios: tuple[int, ...] = (8, 8, 2, 2)
    ngf: int = 32
    n_residual_layers: int = 3
    num_mels: int = 80

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out


def _reflect_pad(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class MelGANResnetBlock(nn.Module):
    """Residual block: lrelu -> dilated k3 conv -> lrelu -> k1 conv, plus
    a k1 shortcut conv (melgan-neurips ResnetBlock)."""

    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, LRELU_SLOPE)
        h = _reflect_pad(h, self.dilation)
        h = nn.Conv(self.dim, (3,), kernel_dilation=(self.dilation,),
                    padding="VALID", name="conv1")(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        h = nn.Conv(self.dim, (1,), name="conv2")(h)
        s = nn.Conv(self.dim, (1,), name="shortcut")(x)
        return s + h


class MelGANGenerator(nn.Module):
    cfg: MelGANConfig = field(default_factory=MelGANConfig)

    @nn.compact
    def __call__(self, mel):
        """mel (B, T, n_mels), log10 domain -> waveform (B, T * 256)."""
        c = self.cfg
        mult = 2 ** len(c.ratios)
        x = _reflect_pad(mel, 3)
        x = nn.Conv(mult * c.ngf, (7,), padding="VALID", name="conv_pre")(x)
        for i, r in enumerate(c.ratios):
            ch = mult * c.ngf // 2
            x = nn.leaky_relu(x, LRELU_SLOPE)
            # torch ConvTranspose1d(k=2r, stride=r, padding=r//2+r%2,
            # output_padding=r%2) gives T*r; for even r flax 'SAME'
            # reproduces it (same relation as the HiFi-GAN k=2u stages)
            x = nn.ConvTranspose(ch, (2 * r,), strides=(r,), padding="SAME",
                                 name=f"up_{i}")(x)
            for j in range(c.n_residual_layers):
                x = MelGANResnetBlock(ch, 3 ** j, name=f"res_{i}_{j}")(x)
            mult //= 2
        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = _reflect_pad(x, 3)
        x = nn.Conv(1, (7,), padding="VALID", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


def convert_torch_melgan(state_dict: dict, cfg: MelGANConfig | None = None
                         ) -> dict:
    """Convert a melgan-neurips Generator torch state dict (keys
    ``model.{i}.weight_g/weight_v/bias`` over the nn.Sequential indices)
    into this module's flax params.  Accepts either the bare generator
    state dict or one nested under ``mel2wav``/``model_g``/``generator``.
    """
    from cmtts_tpu.models.hifigan import torch_conv_getters

    cfg = cfg or MelGANConfig()
    for nest in ("mel2wav", "model_g", "generator", "netG"):
        if any(k.startswith(nest + ".") for k in state_dict):
            state_dict = {k[len(nest) + 1:]: v for k, v in state_dict.items()
                          if k.startswith(nest + ".")}
            break

    get, conv_w, convT_w = torch_conv_getters(state_dict)

    # walk the torch nn.Sequential indices exactly as the generator
    # builds them: [pad, conv] + per stage [lrelu, convT, res*n] +
    # [lrelu, pad, conv, tanh]
    params: dict = {}
    idx = 1
    params["conv_pre"] = {"kernel": conv_w(f"model.{idx}"),
                          "bias": get(f"model.{idx}.bias")}
    idx += 1
    for i in range(len(cfg.ratios)):
        idx += 1  # lrelu
        params[f"up_{i}"] = {"kernel": convT_w(f"model.{idx}"),
                             "bias": get(f"model.{idx}.bias")}
        idx += 1
        for j in range(cfg.n_residual_layers):
            base = f"model.{idx}"
            params[f"res_{i}_{j}"] = {
                "conv1": {"kernel": conv_w(f"{base}.block.2"),
                          "bias": get(f"{base}.block.2.bias")},
                "conv2": {"kernel": conv_w(f"{base}.block.4"),
                          "bias": get(f"{base}.block.4.bias")},
                "shortcut": {"kernel": conv_w(f"{base}.shortcut"),
                             "bias": get(f"{base}.shortcut.bias")},
            }
            idx += 1
    idx += 2  # lrelu, pad
    params["conv_post"] = {"kernel": conv_w(f"model.{idx}"),
                           "bias": get(f"model.{idx}.bias")}
    return params


def load_melgan_params(path: str | None, cfg: MelGANConfig | None = None
                       ) -> dict:
    """Load MelGAN generator params from a local torch checkpoint
    (``best_netG.pt`` or any state-dict-bearing .pt) or an .npz export;
    random init if no path is given."""
    import numpy as np

    cfg = cfg or MelGANConfig()
    if path and path.endswith(".npz"):
        from cmtts_tpu.models.hifigan import unflatten_npz

        return unflatten_npz(path)
    if path:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt if isinstance(ckpt, dict) and any(
            hasattr(v, "numpy") or isinstance(v, np.ndarray)
            for v in ckpt.values()) else ckpt.get("state_dict", ckpt)
        sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
              for k, v in sd.items()
              if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
        return convert_torch_melgan(sd, cfg)
    import warnings

    warnings.warn("no MelGAN checkpoint given; using random init")
    gen = MelGANGenerator(cfg)
    return gen.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, cfg.num_mels)))["params"]

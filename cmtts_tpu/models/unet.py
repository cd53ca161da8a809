"""ADM image UNet for the image-domain consistency-model path, TPU-first.

Re-design of the reference ``model/cm_tool/unet.py`` (890 LoC torch,
inherited from openai/consistency_models): timestep-conditioned ResBlocks
with optional FiLM (scale-shift) conditioning, attention at configured
downsample rates, skip-cat decoder, class conditioning.

TPU-first choices:
- NHWC layout end to end (convs map directly onto the MXU; no NCHW
  transposes);
- attention as two einsums with the reference's fp16-stable
  sqrt(sqrt(d)) scaling, computed in f32 (no fp16 cast needed on TPU —
  the MXU already runs bf16 passes internally);
- the whole forward is one jittable function of (params, x, t, y).

Structure parity map (for the checkpoint converter): flax module names
mirror the torch indices — ``input_{i}_{j}`` / ``middle_{j}`` /
``output_{i}_{j}`` for ``input_blocks[i][j]`` etc., ``time_0``/``time_2``
for the time-embed MLP, ``out_norm_f``/``out_conv_f`` for the head.
Reference anchors: UNetModel ``unet.py:518-787``, ResBlock ``:143-256``,
AttentionBlock ``:259-329``, QKVAttentionLegacy ``:397-441``,
Up/Downsample ``:81-141``, factory ``script_util.py:129-183``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_CLASSES = 1000  # reference script_util.py NUM_CLASSES


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """[cos | sin] sinusoidal embedding (cm_tool/nn.py:121-139 — note the
    image path puts cos FIRST, unlike the TTS denoiser's [sin | cos])."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


@dataclass(frozen=True)
class UNetConfig:
    """Mirrors the reference UNetModel constructor (unet.py:549-570)."""

    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: tuple[int, ...] = (8, 16)  # downsample rates
    dropout: float = 0.0
    channel_mult: tuple[float, ...] = (1, 2, 3, 4)
    conv_resample: bool = True
    num_classes: int | None = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False

    def heads_for(self, ch: int, upsample: bool = False) -> int:
        if self.num_head_channels != -1:
            assert ch % self.num_head_channels == 0
            return ch // self.num_head_channels
        if upsample and self.num_heads_upsample != -1:
            return self.num_heads_upsample
        return self.num_heads


def _norm(name: str):
    # reference normalization() = GroupNorm(32, C) computed in f32
    # (cm_tool/nn.py:19-21, 111-118)
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)


def _conv3(ch: int, name: str, stride: int = 1, zero: bool = False):
    init = nn.initializers.zeros_init() if zero else nn.initializers.lecun_normal()
    return nn.Conv(ch, (3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), kernel_init=init, name=name)


def _upsample_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class ImageResBlock(nn.Module):
    """ResBlock with optional FiLM conditioning and fused up/down
    resampling (reference unet.py:143-256)."""

    out_ch: int
    dropout: float
    use_scale_shift_norm: bool
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = nn.silu(_norm("in_norm")(x))
        if self.up:
            h = _upsample_nearest(h)
            x = _upsample_nearest(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), (2, 2))
            x = nn.avg_pool(x, (2, 2), (2, 2))
        h = _conv3(self.out_ch, "in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_ch if self.use_scale_shift_norm else self.out_ch,
            name="emb_proj")(nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _norm("out_norm")(h) * (1.0 + scale[:, None, None, :]) \
                + shift[:, None, None, :]
        else:
            h = h + emb_out[:, None, None, :]
            h = _norm("out_norm")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv3(self.out_ch, "out_conv", zero=True)(h)

        if self.out_ch != in_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip")(x)
        return x + h


class ImageAttention(nn.Module):
    """Spatial self-attention (reference unet.py:259-329).  Both qkv
    orderings share the (three, heads, d) channel layout — 'legacy'
    (split heads before qkv) and 'new' (split qkv before heads) are the
    same contraction, so one f32 einsum path serves both; the reference's
    fp16 cast in the legacy path is a CUDA memory optimization with no
    TPU analogue."""

    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _norm("norm")(x).reshape(B, H * W, C)
        qkv = nn.Conv(3 * C, (1,), name="qkv")(h)
        nh, d = self.num_heads, C // self.num_heads
        q, k, v = [a.reshape(B, H * W, nh, d)
                   for a in jnp.split(qkv.reshape(B, H * W, 3, C), 3, axis=2)]
        scale = 1.0 / math.sqrt(math.sqrt(d))
        w = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
        w = jax.nn.softmax(w, axis=-1)
        a = jnp.einsum("bhts,bshd->bthd", w, v).reshape(B, H * W, C)
        a = nn.Conv(C, (1,), kernel_init=nn.initializers.zeros_init(),
                    name="proj_out")(a)
        return x + a.reshape(B, H, W, C)


class ImageUNet(nn.Module):
    """The full UNet (reference unet.py:518-787), NHWC.

    __call__(x (B, H, W, C_in), timesteps (B,), y (B,) or None)
    -> (B, H, W, C_out).
    """

    cfg: UNetConfig = field(default_factory=UNetConfig)

    @nn.compact
    def __call__(self, x, timesteps, y=None, deterministic: bool = True):
        c = self.cfg
        assert (y is not None) == (c.num_classes is not None), \
            "y iff class-conditional"
        time_dim = c.model_channels * 4
        emb = nn.Dense(time_dim, name="time_0")(
            timestep_embedding(timesteps, c.model_channels))
        emb = nn.Dense(time_dim, name="time_2")(nn.silu(emb))
        if c.num_classes is not None:
            emb = emb + nn.Embed(c.num_classes, time_dim, name="label_emb")(y)

        def res(i, j, out_ch, up=False, down=False, prefix="input"):
            return ImageResBlock(
                out_ch, c.dropout, c.use_scale_shift_norm, up=up, down=down,
                name=f"{prefix}_{i}_{j}")

        ch = int(c.channel_mult[0] * c.model_channels)
        h = _conv3(ch, "input_0_0")(x)
        hs = [h]
        chans = [ch]
        ds = 1
        i = 1
        for level, mult in enumerate(c.channel_mult):
            for _ in range(c.num_res_blocks):
                ch = int(mult * c.model_channels)
                h = res(i, 0, ch)(h, emb, deterministic)
                if ds in c.attention_resolutions:
                    h = ImageAttention(c.heads_for(ch),
                                       name=f"input_{i}_1")(h)
                hs.append(h)
                chans.append(ch)
                i += 1
            if level != len(c.channel_mult) - 1:
                if c.resblock_updown:
                    h = res(i, 0, ch, down=True)(h, emb, deterministic)
                elif c.conv_resample:
                    h = _conv3(ch, f"input_{i}_0", stride=2)(h)
                else:
                    h = nn.avg_pool(h, (2, 2), (2, 2))
                hs.append(h)
                chans.append(ch)
                ds *= 2
                i += 1

        h = res("", 0, ch, prefix="middle")(h, emb, deterministic)
        h = ImageAttention(c.heads_for(ch), name="middle__1")(h)
        h = res("", 2, ch, prefix="middle")(h, emb, deterministic)

        i = 0
        for level, mult in list(enumerate(c.channel_mult))[::-1]:
            for j in range(c.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                chans.pop()
                ch = int(mult * c.model_channels)
                h = res(i, 0, ch, prefix="output")(h, emb, deterministic)
                nxt = 1
                if ds in c.attention_resolutions:
                    h = ImageAttention(c.heads_for(ch, upsample=True),
                                       name=f"output_{i}_1")(h)
                    nxt = 2
                if level and j == c.num_res_blocks:
                    if c.resblock_updown:
                        h = res(i, nxt, ch, up=True, prefix="output")(
                            h, emb, deterministic)
                    else:
                        h = _upsample_nearest(h)
                        if c.conv_resample:
                            h = _conv3(ch, f"output_{i}_{nxt}")(h)
                    ds //= 2
                i += 1

        h = nn.silu(_norm("out_norm_f")(h))
        return _conv3(c.out_channels, "out_conv_f", zero=True)(h)


def create_image_unet(image_size: int, num_channels: int,
                      num_res_blocks: int, channel_mult: str = "",
                      learn_sigma: bool = False, class_cond: bool = False,
                      attention_resolutions: str = "16", num_heads: int = 1,
                      num_head_channels: int = -1,
                      num_heads_upsample: int = -1,
                      use_scale_shift_norm: bool = False, dropout: float = 0.0,
                      resblock_updown: bool = False,
                      use_new_attention_order: bool = False) -> ImageUNet:
    """Factory mirroring reference ``create_model`` (script_util.py:129-183):
    per-size default channel multipliers, attention ds from resolution
    strings, 3-channel RGB in, 3 or 6 (learn_sigma) out."""
    if channel_mult == "":
        mults = {512: (0.5, 1, 1, 2, 2, 4, 4), 256: (1, 1, 2, 2, 4, 4),
                 128: (1, 1, 2, 3, 4), 64: (1, 2, 3, 4)}
        if image_size not in mults:
            raise ValueError(f"unsupported image size: {image_size}")
        mult = mults[image_size]
    else:
        mult = tuple(int(m) for m in channel_mult.split(","))
    attn_ds = tuple(image_size // int(r)
                    for r in str(attention_resolutions).split(","))
    cfg = UNetConfig(
        image_size=image_size,
        in_channels=3,
        model_channels=num_channels,
        out_channels=6 if learn_sigma else 3,
        num_res_blocks=num_res_blocks,
        attention_resolutions=attn_ds,
        dropout=dropout,
        channel_mult=mult,
        num_classes=NUM_CLASSES if class_cond else None,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order,
    )
    return ImageUNet(cfg)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_unet(state_dict: dict, cfg: UNetConfig) -> dict:
    """Reference UNetModel state dict -> ImageUNet flax params.

    Walks the torch key space (``input_blocks.{i}.{j}.*`` etc.) and maps
    each layer kind onto the mirrored flax names; conv kernels
    (O, I, kh, kw) -> (kh, kw, I, O), linears (O, I) -> (I, O), GroupNorm
    weight/bias -> scale/bias.  The qkv/proj_out 1x1 convs are stored as
    width-1 convs in both frameworks.
    """
    import numpy as np

    params: dict = {}

    def put(path, leaf, value):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    def conv_k(w):
        w = np.asarray(w)
        if w.ndim == 4:
            return np.transpose(w, (2, 3, 1, 0))
        return np.transpose(w, (2, 1, 0))  # conv1d (O,I,k)->(k,I,O)

    sub_map = {
        "in_layers.0": ("in_norm", "norm"),
        "in_layers.2": ("in_conv", "conv"),
        "emb_layers.1": ("emb_proj", "dense"),
        "out_layers.0": ("out_norm", "norm"),
        "out_layers.3": ("out_conv", "conv"),
        "skip_connection": ("skip", "conv"),
        "norm": ("norm", "norm"),
        # torch stores these as 2-D 1x1 convs; the flax attention runs on
        # the flattened (B, HW, C) sequence with width-1 1-D convs
        "qkv": ("qkv", "conv1"),
        "proj_out": ("proj_out", "conv1"),
        "conv": (None, "conv"),   # Upsample.conv -> the block itself
        "op": (None, "conv"),     # Downsample conv -> the block itself
    }

    for key, w in state_dict.items():
        w = np.asarray(w)
        parts = key.split(".")
        if parts[0] == "time_embed":
            put([f"time_{parts[1]}"],
                "kernel" if parts[2] == "weight" else "bias",
                w.T if parts[2] == "weight" else w)
            continue
        if parts[0] == "label_emb":
            put(["label_emb"], "embedding", w)
            continue
        if parts[0] == "out":
            name = "out_norm_f" if parts[1] == "0" else "out_conv_f"
            if parts[1] == "0":
                put([name], "scale" if parts[2] == "weight" else "bias", w)
            else:
                put([name], "kernel" if parts[2] == "weight" else "bias",
                    conv_k(w) if parts[2] == "weight" else w)
            continue
        if parts[0] in ("input_blocks", "middle_block", "output_blocks"):
            if parts[0] == "middle_block":
                i, j, rest = "", parts[1], parts[2:]
                flax_block = f"middle_{i}_{j}"
            else:
                stem = "input" if parts[0] == "input_blocks" else "output"
                i, j, rest = parts[1], parts[2], parts[3:]
                flax_block = f"{stem}_{i}_{j}"
            if rest[0] == "weight" or rest[0] == "bias":
                # plain conv block (input_blocks.0.0, conv up/downsample)
                put([flax_block], "kernel" if rest[0] == "weight" else "bias",
                    conv_k(w) if rest[0] == "weight" else w)
                continue
            sub = ".".join(rest[:-1])
            leafk = rest[-1]
            if sub not in sub_map:
                raise KeyError(f"unmapped torch key {key}")
            flax_sub, kind = sub_map[sub]
            path = [flax_block] + ([flax_sub] if flax_sub else [])
            if kind == "norm":
                put(path, "scale" if leafk == "weight" else "bias", w)
            elif kind == "dense":
                put(path, "kernel" if leafk == "weight" else "bias",
                    w.T if leafk == "weight" else w)
            elif kind == "conv1":
                if leafk == "weight":
                    # (O, I, 1, 1) or (O, I, 1) -> (1, I, O)
                    w = w.reshape(w.shape[0], w.shape[1], 1)
                    w = np.transpose(w, (2, 1, 0))
                put(path, "kernel" if leafk == "weight" else "bias", w)
            else:
                put(path, "kernel" if leafk == "weight" else "bias",
                    conv_k(w) if leafk == "weight" else w)
            continue
        raise KeyError(f"unmapped torch key {key}")

    return params

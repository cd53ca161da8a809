"""FFT-block phoneme encoder (FastSpeech2-style), TPU-first.

Re-design of the reference encoder stack (``model/modules.py:32-151``,
``model/blocks.py:516-618``): pre-LN self-attention + conv-FFN blocks in
batch-major (B, T, C) layout with additive attention bias instead of the
reference's T×B×C fairseq layout and masked_fill.  Masking multiplies the
activations after every sublayer, matching reference semantics
(``modules.py:93-99``, ``blocks.py:610-617``).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cmtts_tpu.core.config import TransformerConfig

NEG_INF = -1e9


def sinusoid_table(n_positions: int, dim: int) -> np.ndarray:
    """Fairseq-style sinusoidal table: [sin | cos] concatenated (not
    interleaved), row 0 zeroed for the padding index.

    Parity: reference ``SinusoidalPositionalEmbedding.get_embedding``
    (model/blocks.py:43-60).
    """
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000.0) / (half - 1)))
    args = np.arange(n_positions, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n_positions, 1))], axis=1)
    table[0, :] = 0.0
    return table.astype(np.float32)


from functools import lru_cache


@lru_cache(maxsize=16)
def _cached_table(n_positions: int, dim: int) -> np.ndarray:
    return sinusoid_table(n_positions, dim)


def positions_from_mask(nonpad: jnp.ndarray) -> jnp.ndarray:
    """Position ids: cumulative count over valid steps, 0 at padding.

    Parity: reference ``make_positions`` (utils/tools.py:810-822) with
    padding_idx=0.
    """
    nonpad = nonpad.astype(jnp.int32)
    return jnp.cumsum(nonpad, axis=1) * nonpad


class PositionalEmbedding(nn.Module):
    """Lookup into a fixed sinusoidal table, with optional learned scale
    (``pos_embed_alpha``, reference model/modules.py:61)."""

    dim: int
    max_positions: int
    learned_alpha: bool = False

    @nn.compact
    def __call__(self, positions: jnp.ndarray) -> jnp.ndarray:
        # fixed (non-learned) table, embedded as an XLA constant
        table = jnp.asarray(_cached_table(self.max_positions + 2, self.dim))
        emb = jnp.take(table, jnp.clip(positions, 0, self.max_positions + 1), axis=0)
        if self.learned_alpha:
            alpha = self.param("alpha", lambda k: jnp.ones((1,), jnp.float32))
            emb = alpha * emb
        return emb


class MultiHeadSelfAttention(nn.Module):
    """Bias-free MHSA (the reference instantiates fairseq attention with
    bias=False, model/blocks.py:584-586) with additive key-padding bias."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        B, T, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, use_bias=False, kernel_init=nn.initializers.xavier_uniform(),
                       dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (hd ** -0.5)
        bias = jnp.where(pad_mask[:, None, None, :], NEG_INF, 0.0)
        probs = jax.nn.softmax(logits + bias, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(C, use_bias=False, kernel_init=nn.initializers.xavier_uniform(),
                        dtype=self.dtype, name="out")(out)


class ConvFFN(nn.Module):
    """Conv-k9 feed-forward with 1/sqrt(k) post-scale (reference
    TransformerFFNLayer, model/blocks.py:516-552)."""

    hidden: int
    filter_size: int
    kernel_size: int
    dropout: float
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        h = h * (self.kernel_size ** -0.5)
        if self.act == "gelu":
            h = jax.nn.gelu(h, approximate=False)
        elif self.act == "relu":
            h = jax.nn.relu(h)
        elif self.act == "swish":
            h = h * jax.nn.sigmoid(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden, kernel_init=nn.initializers.xavier_uniform(),
                     dtype=self.dtype, name="proj")(h)
        return h


class FFTBlock(nn.Module):
    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        nonpad = (~pad_mask).astype(x.dtype)[..., None]
        c = self.cfg

        residual = x
        h = nn.LayerNorm(epsilon=1e-12, name="ln_attn")(x)
        h = MultiHeadSelfAttention(c.encoder_head, dtype=self.dtype, name="attn")(
            h, pad_mask, deterministic)
        h = nn.Dropout(c.encoder_dropout)(h, deterministic=deterministic)
        x = (residual + h) * nonpad

        residual = x
        h = nn.LayerNorm(epsilon=1e-12, name="ln_ffn")(x)
        h = ConvFFN(c.encoder_hidden, 4 * c.encoder_hidden, c.ffn_kernel_size,
                    c.encoder_dropout, c.ffn_act, dtype=self.dtype, name="ffn")(
            h, deterministic)
        h = nn.Dropout(c.encoder_dropout)(h, deterministic=deterministic)
        x = (residual + h) * nonpad
        return x


class FFTEncoder(nn.Module):
    """Token embedding (scaled by sqrt(H)) + sinusoidal positions + N FFT
    blocks + final LayerNorm (reference FastspeechEncoder,
    model/modules.py:108-151)."""

    cfg: TransformerConfig
    vocab_size: int
    max_seq_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, pad_mask, deterministic: bool = True):
        c = self.cfg
        H = c.encoder_hidden
        emb = nn.Embed(
            self.vocab_size, H,
            embedding_init=nn.initializers.normal(stddev=H ** -0.5),
            name="tok_embed",
        )(tokens)
        x = math.sqrt(H) * emb
        positions = positions_from_mask(~pad_mask)
        x = x + PositionalEmbedding(H, self.max_seq_len * 2, name="pos")(positions)
        x = nn.Dropout(c.encoder_dropout)(x, deterministic=deterministic)
        nonpad = (~pad_mask).astype(x.dtype)[..., None]
        x = x * nonpad
        for i in range(c.encoder_layer):
            x = FFTBlock(c, dtype=self.dtype, name=f"block_{i}")(x, pad_mask, deterministic)
        x = nn.LayerNorm(epsilon=1e-12, name="ln_out")(x) * nonpad
        return x

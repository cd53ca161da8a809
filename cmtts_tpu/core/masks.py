"""Sequence masks and static-shape length bucketing.

The reference pads every batch to its dynamic ``max(lens)`` and threads
boolean padding masks everywhere (``utils/tools.py:275-283``).  On TPU,
dynamic shapes force one XLA compilation per unique length, so we bucket:
every batch is padded up to a fixed bucket length, and XLA compiles one
graph per bucket.  Masks are computed inside the graph from lengths.
"""

from __future__ import annotations

import bisect
from typing import Sequence

import jax.numpy as jnp
import numpy as np

# Default buckets chosen for the reference corpora: phoneme sequences
# top out around 200 tokens, mel sequences at max_seq_len (1000/1200
# frames, reference config/*/model.yaml).  Bucket edges are multiples of
# the TPU lane width where possible.
DEFAULT_TEXT_BUCKETS: tuple[int, ...] = (32, 64, 96, 128, 192, 256)
DEFAULT_MEL_BUCKETS: tuple[int, ...] = (128, 256, 384, 512, 768, 1024, 1280)


def length_mask(lengths, max_len: int):
    """Boolean *padding* mask: True where position >= length.

    Same orientation as the reference ``get_mask_from_lengths``
    (``utils/tools.py:275-283``): True marks padding.
    """
    ids = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return ids >= lengths[:, None].astype(jnp.int32)


def valid_mask(lengths, max_len: int):
    """Float mask: 1.0 on valid positions, 0.0 on padding."""
    return (~length_mask(lengths, max_len)).astype(jnp.float32)


def pick_bucket(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length (host-side; clamps to the largest bucket)."""
    i = bisect.bisect_left(buckets, length)
    return buckets[min(i, len(buckets) - 1)]


def pad_to(x: np.ndarray, target: int, axis: int = 0, value=0) -> np.ndarray:
    """Host-side pad/truncate along ``axis`` to exactly ``target``."""
    n = x.shape[axis]
    if n == target:
        return x
    if n > target:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, target)
        return x[tuple(sl)]
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - n)
    return np.pad(x, widths, mode="constant", constant_values=value)

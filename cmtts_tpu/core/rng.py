"""RNG discipline: batch-size- and world-size-invariant eval sampling.

Reference ``model/cm_tool/random_util.py``: ``DummyGenerator`` (plain
RNG), ``DeterministicGenerator`` / ``DeterministicIndividualGenerator``
give every *global sample index* its own seeded stream so evaluation
noise is identical regardless of per-host batch size or world size
(config pins ``generator: determ, seed: 42``,
config/LJSpeech/train.yaml:99-101).

JAX version: fold the global sample index into the key — the stream for
sample i is ``fold_in(key, i)`` no matter which host/batch slices it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class DummyGenerator:
    """Plain key-splitting generator (random_util.py:6-25)."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def _next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def randn(self, *shape, dtype=jnp.float32):
        return jax.random.normal(self._next(), shape, dtype)

    def randint(self, low, high, shape):
        return jax.random.randint(self._next(), shape, low, high)


class DeterministicGenerator:
    """Per-global-sample-index streams (random_util.py:28-183).

    ``randn(n, *rest)`` treats the leading dim as the batch; sample i of
    the current eval pass gets noise from ``fold_in(seed_key, offset+i)``
    — invariant to how the eval set is batched or sharded.
    """

    def __init__(self, seed: int = 42, rank: int = 0, world_size: int = 1):
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self._offset = 0

    def set_offset(self, offset: int) -> None:
        """Global index of the first sample in the next batch."""
        self._offset = int(offset)

    def advance(self, n: int) -> None:
        self._offset += int(n) * self.world_size

    def _sample_keys(self, n: int):
        base = jax.random.PRNGKey(self.seed)
        idx = self._offset + jnp.arange(n) * self.world_size + self.rank
        return jax.vmap(lambda i: jax.random.fold_in(base, i))(idx)

    def randn(self, *shape, dtype=jnp.float32):
        n, rest = shape[0], shape[1:]
        keys = self._sample_keys(n)
        out = jax.vmap(lambda k: jax.random.normal(k, rest, dtype))(keys)
        return out

    def randint(self, low, high, shape):
        n, rest = shape[0], tuple(shape[1:])
        keys = self._sample_keys(n)
        return jax.vmap(lambda k: jax.random.randint(k, rest, low, high))(keys)


def get_generator(name: str, seed: int = 42, rank: int = 0,
                  world_size: int = 1):
    """Factory (random_util.py:6-14): 'dummy' | 'determ' | 'determ-indiv'
    ('determ' and 'determ-indiv' coincide here — per-sample streams are
    the native JAX formulation)."""
    if name == "dummy":
        return DummyGenerator(seed)
    if name in ("determ", "determ-indiv"):
        return DeterministicGenerator(seed, rank, world_size)
    raise NotImplementedError(name)

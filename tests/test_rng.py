"""Deterministic generators: batch-size and world-size invariance."""

import numpy as np

from cmtts_tpu.core.rng import DeterministicGenerator, get_generator


def test_batch_size_invariance():
    g = DeterministicGenerator(seed=42)
    full = np.asarray(g.randn(8, 4, 3))

    g2 = DeterministicGenerator(seed=42)
    parts = []
    for start in (0, 3, 6):
        g2.set_offset(start)
        n = min(3, 8 - start)
        parts.append(np.asarray(g2.randn(n, 4, 3)))
    np.testing.assert_array_equal(np.concatenate(parts), full)


def test_world_size_invariance():
    # 1 host with batch 4 == 2 "hosts" with batch 2 interleaved
    g = DeterministicGenerator(seed=7, rank=0, world_size=1)
    full = np.asarray(g.randn(4, 5))
    r0 = DeterministicGenerator(seed=7, rank=0, world_size=2)
    r1 = DeterministicGenerator(seed=7, rank=1, world_size=2)
    a = np.asarray(r0.randn(2, 5))
    b = np.asarray(r1.randn(2, 5))
    np.testing.assert_array_equal(full[0], a[0])
    np.testing.assert_array_equal(full[1], b[0])
    np.testing.assert_array_equal(full[2], a[1])
    np.testing.assert_array_equal(full[3], b[1])


def test_factory_and_dummy():
    g = get_generator("dummy", seed=1)
    x = np.asarray(g.randn(2, 3))
    y = np.asarray(g.randn(2, 3))
    assert x.shape == (2, 3) and not np.array_equal(x, y)
    d = get_generator("determ", seed=42)
    assert isinstance(d, DeterministicGenerator)

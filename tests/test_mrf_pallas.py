"""Fused MRF Pallas kernel vs the flax ResBlock stack (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.models.hifigan import LRELU_SLOPE, ResBlock
from cmtts_tpu.ops.mrf_pallas import (
    _receptive_radius,
    fused_mrf_stage,
    fused_mrf_stage_streamed,
    pack_mrf_params,
    pack_mrf_params_streamed,
)


def flax_mrf(params, x, C, kernel_sizes=(3, 7, 11), dilations=(1, 3, 5),
             stage=0):
    acc = None
    for j, k in enumerate(kernel_sizes):
        block = ResBlock(C, k, dilations)
        h = block.apply({"params": params[f"res_{stage}_{j}"]}, x)
        acc = h if acc is None else acc + h
    return acc / len(kernel_sizes)


def make_params(C, kernel_sizes=(3, 7, 11), dilations=(1, 3, 5), seed=0):
    rng = jax.random.PRNGKey(seed)
    params = {}
    for j, k in enumerate(kernel_sizes):
        block = ResBlock(C, k, dilations)
        rng, sub = jax.random.split(rng)
        params[f"res_0_{j}"] = block.init(sub, jnp.zeros((1, 32, C)))["params"]
    return params


@pytest.mark.parametrize("C,L,tile", [(32, 300, 128), (128, 260, 128)])
def test_fused_mrf_matches_flax(C, L, tile):
    params = make_params(C)
    x = jnp.asarray(np.random.RandomState(0).randn(2, L, C), jnp.float32) * 0.3
    ref = flax_mrf(params, x, C)
    packed = pack_mrf_params(params, 0, C)
    out = fused_mrf_stage(x, packed, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_receptive_radius():
    # widest block: k=11, dilations 1,3,5 -> 5*(1+3+5) + 3*5 = 60
    assert _receptive_radius((3, 7, 11), (1, 3, 5)) == 60


def test_hifigan_fused_apply_matches_module():
    from cmtts_tpu.models.hifigan import (
        HiFiGANConfig, HiFiGANGenerator, hifigan_apply_fused)

    cfg = HiFiGANConfig(upsample_initial_channel=64, num_mels=16)
    gen = HiFiGANGenerator(cfg)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 24, 16), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    ref = gen.apply({"params": params}, mel)
    out = hifigan_apply_fused(params, mel, cfg, interpret=True,
                              pallas_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # default mixed precision (bf16 pallas stages): looser tolerance
    out_bf = hifigan_apply_fused(params, mel, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out_bf), np.asarray(ref),
                               rtol=0.1, atol=0.05)


@pytest.mark.parametrize("C,L,tile", [(256, 300, 256), (256, 700, 256)])
def test_streamed_mrf_matches_flax(C, L, tile):
    """Weight-streaming stage-0 kernel (bf16 weights DMA'd from HBM,
    double-buffered) against the flax ResBlock stack."""
    params = make_params(C)
    x = jnp.asarray(np.random.RandomState(0).randn(2, L, C), jnp.float32) * 0.3
    ref = flax_mrf(params, x, C)
    # f32 weights: exact up to reassociation
    w, b = pack_mrf_params_streamed(params, 0, C, weight_dtype=jnp.float32)
    out = fused_mrf_stage_streamed(x, w, b, tile=tile, interpret=True,
                                   compute_dtype=jnp.float32,
                                   dot_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    # production precision (bf16 weights/activations, f32 accumulate)
    w16, b16 = pack_mrf_params_streamed(params, 0, C)
    out16 = fused_mrf_stage_streamed(x, w16, b16, tile=tile, interpret=True,
                                     compute_dtype=jnp.bfloat16,
                                     dot_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out16, dtype=np.float32),
                               np.asarray(ref), rtol=0.1, atol=0.05)


def test_fused_mrf_single_tile_short_input():
    C = 32
    params = make_params(C)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 50, C), jnp.float32)
    ref = flax_mrf(params, x, C)
    out = fused_mrf_stage(x, pack_mrf_params(params, 0, C), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

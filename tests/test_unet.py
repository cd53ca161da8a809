"""Golden parity: reference ADM image UNet (torch) vs cmtts_tpu ImageUNet.

Instantiates the reference ``model/cm_tool/unet.py`` UNetModel with random
weights, converts the state dict, and compares forward outputs.  The
reference attention runs its einsums in fp16 (QKVAttentionLegacy casts
qkv.half(), unet.py:409-441) while the flax port stays f32, so attention
configs compare at fp16 tolerance.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model", "cm_tool")),
    reason="reference snapshot not mounted")


@pytest.fixture(scope="module")
def ref_unet_mod():
    sys.path.insert(0, REF)
    pkg = types.ModuleType("model")
    pkg.__path__ = [os.path.join(REF, "model")]
    sys.modules.setdefault("model", pkg)
    sub = types.ModuleType("model.cm_tool")
    sub.__path__ = [os.path.join(REF, "model", "cm_tool")]
    sys.modules.setdefault("model.cm_tool", sub)
    try:
        import model.cm_tool.unet as ref_unet
    finally:
        sys.path.remove(REF)
    return ref_unet


def _compare(ref_unet_mod, torch_kwargs, flax_cfg, y=None, atol=2e-2):
    import torch

    from cmtts_tpu.models.unet import ImageUNet, convert_torch_unet

    torch.manual_seed(0)
    tm = ref_unet_mod.UNetModel(**torch_kwargs)
    tm.eval()

    B, C, S = 2, torch_kwargs["in_channels"], torch_kwargs["image_size"]
    rng = np.random.RandomState(0)
    x = rng.randn(B, C, S, S).astype(np.float32)
    t = np.array([0.5, 7.3], np.float32)

    with torch.no_grad():
        want = tm(torch.tensor(x), torch.tensor(t),
                  None if y is None else torch.tensor(y)).numpy()

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_torch_unet(sd, flax_cfg)
    fm = ImageUNet(flax_cfg)
    got = fm.apply({"params": params},
                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                   jnp.asarray(t),
                   None if y is None else jnp.asarray(y))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    # no orphan params: the converter must cover the whole torch dict and
    # the module must consume every converted leaf
    init = fm.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, S, S, C)), jnp.zeros((1,)),
                   None if y is None else jnp.zeros((1,), jnp.int32))["params"]
    assert jax.tree_util.tree_structure(init) == \
        jax.tree_util.tree_structure(jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(got, want, atol=atol)


def test_unet_parity_basic_attention(ref_unet_mod):
    """Two levels, attention at ds=2, conv resample (the ADM default
    topology, unet.py:518-755)."""
    from cmtts_tpu.models.unet import UNetConfig

    kw = dict(image_size=16, in_channels=3, model_channels=32,
              out_channels=3, num_res_blocks=1, attention_resolutions=(2,),
              dropout=0.0, channel_mult=(1, 2), num_heads=2)
    cfg = UNetConfig(image_size=16, in_channels=3, model_channels=32,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=2)
    _compare(ref_unet_mod, kw, cfg)


def test_unet_parity_film_updown_classcond(ref_unet_mod):
    """FiLM (scale-shift norm) + resblock up/down + class conditioning +
    head-channel-derived head counts (unet.py:588-736)."""
    from cmtts_tpu.models.unet import UNetConfig

    kw = dict(image_size=16, in_channels=3, model_channels=32,
              out_channels=6, num_res_blocks=1, attention_resolutions=(2,),
              dropout=0.0, channel_mult=(1, 2), num_classes=10,
              num_head_channels=16, use_scale_shift_norm=True,
              resblock_updown=True)
    cfg = UNetConfig(image_size=16, in_channels=3, model_channels=32,
                     out_channels=6, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_classes=10, num_head_channels=16,
                     use_scale_shift_norm=True, resblock_updown=True)
    y = np.array([3, 7], np.int64)
    _compare(ref_unet_mod, kw, cfg, y=y)


def test_unet_parity_no_attention(ref_unet_mod):
    """Attention-free config isolates ResBlock/resample parity at f32
    tolerance (no fp16 attention in the reference path)."""
    from cmtts_tpu.models.unet import UNetConfig

    kw = dict(image_size=8, in_channels=3, model_channels=32,
              out_channels=3, num_res_blocks=2, attention_resolutions=(),
              dropout=0.0, channel_mult=(1, 2))
    cfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                     out_channels=3, num_res_blocks=2,
                     attention_resolutions=(), channel_mult=(1, 2))
    _compare(ref_unet_mod, kw, cfg, atol=2e-5)


def test_create_image_unet_factory():
    """Factory parity with script_util.create_model defaults
    (script_util.py:129-183)."""
    from cmtts_tpu.models.unet import NUM_CLASSES, create_image_unet

    m = create_image_unet(64, 128, 2, attention_resolutions="16,8",
                          class_cond=True, learn_sigma=True)
    c = m.cfg
    assert c.channel_mult == (1, 2, 3, 4)
    assert sorted(c.attention_resolutions) == [4, 8]  # 64//16, 64//8
    assert c.out_channels == 6
    assert c.num_classes == NUM_CLASSES
    with pytest.raises(ValueError):
        create_image_unet(48, 128, 2)

"""MelGAN generator: shapes + golden parity vs a torch construction of
the melgan-neurips architecture (the reference loads it via torch.hub,
``utils/model.py:159-169``; the torch modules here are built from the
published architecture spec with random weight-normed weights, the same
recipe as the MBNet/LDNet golden tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.models.melgan import (
    MelGANConfig,
    MelGANGenerator,
    convert_torch_melgan,
    load_melgan_params,
)

TINY = MelGANConfig(ratios=(4, 4), ngf=4, n_residual_layers=2, num_mels=8)


def test_melgan_shapes():
    gen = MelGANGenerator(TINY)
    mel = jnp.zeros((2, 12, 8))
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (2, 12 * 16)
    assert TINY.hop_length == 16
    assert MelGANConfig().hop_length == 256


def _torch_melgan(cfg: MelGANConfig):
    import torch.nn as tnn
    from torch.nn.utils import weight_norm

    def wn_conv(*a, **k):
        return weight_norm(tnn.Conv1d(*a, **k))

    class ResnetBlock(tnn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = tnn.Sequential(
                tnn.LeakyReLU(0.2), tnn.ReflectionPad1d(dilation),
                wn_conv(dim, dim, 3, dilation=dilation),
                tnn.LeakyReLU(0.2), wn_conv(dim, dim, 1))
            self.shortcut = wn_conv(dim, dim, 1)

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    mult = 2 ** len(cfg.ratios)
    model = [tnn.ReflectionPad1d(3),
             wn_conv(cfg.num_mels, mult * cfg.ngf, 7)]
    for r in cfg.ratios:
        model += [tnn.LeakyReLU(0.2),
                  weight_norm(tnn.ConvTranspose1d(
                      mult * cfg.ngf, mult * cfg.ngf // 2, r * 2, stride=r,
                      padding=r // 2 + r % 2, output_padding=r % 2))]
        for j in range(cfg.n_residual_layers):
            model += [ResnetBlock(mult * cfg.ngf // 2, 3 ** j)]
        mult //= 2
    model += [tnn.LeakyReLU(0.2), tnn.ReflectionPad1d(3),
              wn_conv(cfg.ngf, 1, 7), tnn.Tanh()]

    class Gen(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = tnn.Sequential(*model)

        def forward(self, x):
            return self.model(x)

    return Gen()


def test_melgan_torch_golden_parity():
    torch = pytest.importorskip("torch")
    torch.manual_seed(7)
    tgen = _torch_melgan(TINY).eval()
    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}

    params = convert_torch_melgan(sd, TINY)
    mel = np.random.default_rng(3).normal(size=(2, 17, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tgen(torch.from_numpy(mel).transpose(1, 2)).squeeze(1).numpy()
    out = np.asarray(MelGANGenerator(TINY).apply(
        {"params": params}, jnp.asarray(mel)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_melgan_nested_state_dict_and_loader(tmp_path):
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    tgen = _torch_melgan(TINY)
    sd = {"mel2wav." + k: v.detach().numpy()
          for k, v in tgen.state_dict().items()}
    params = convert_torch_melgan(sd, TINY)
    assert "conv_pre" in params and "res_1_1" in params

    # local-checkpoint loader path (the whole point of the MelGAN gate:
    # assets, not code)
    path = str(tmp_path / "best_netG.pt")
    torch.save(tgen.state_dict(), path)
    loaded = load_melgan_params(path, TINY)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(
        jax.tree_util.tree_map(np.asarray, loaded),
        jax.tree_util.tree_map(np.asarray, params), rtol=1e-6)

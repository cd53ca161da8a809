"""Legacy DiffGAN-TTS adversarial losses + JCU discriminator.

Golden parity for every loss formula that exists in the reference
snapshot (``model/loss.py``: LSGAN JCU losses, feature matching, the
nonzero-weighted mel L1, windowed SSIM); structural/behavioral tests for
the JCU discriminator, whose source the reference is missing (only its
config block and call sites exist — see models/discriminator.py).
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF, "model"))


@pytest.fixture(scope="module")
def ref_loss_mod():
    """Import reference model.loss with stubs for absent C-extensions."""
    if not HAVE_REF:
        pytest.skip("reference snapshot not mounted")
    for name in ("librosa", "parselmouth", "pycwt", "inflect"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "pycwt":
                mod.wavelet = types.SimpleNamespace(MexicanHat=object, cwt=None)
            if name == "inflect":
                mod.engine = lambda: None
            sys.modules[name] = mod
    if "unidecode" not in sys.modules:
        mod = types.ModuleType("unidecode")
        mod.unidecode = lambda s: s
        sys.modules["unidecode"] = mod
    sys.path.insert(0, REF)
    pkg = types.ModuleType("model")
    pkg.__path__ = [os.path.join(REF, "model")]
    sys.modules.setdefault("model", pkg)
    try:
        import model.loss as ref_loss
    finally:
        sys.path.remove(REF)
    return ref_loss


def test_lsgan_losses_match_reference(ref_loss_mod):
    import torch

    from cmtts_tpu.cm.gan_losses import get_adversarial_losses_fn

    rng = np.random.RandomState(0)
    shape = (2, 1, 25)
    r_c, r_u, f_c, f_u = [rng.randn(*shape).astype(np.float32)
                          for _ in range(4)]
    mask = (rng.rand(*shape) > 0.3).astype(np.float32)

    ref_d, ref_g = ref_loss_mod.get_adversarial_losses_fn("lsgan")
    my_d, my_g = get_adversarial_losses_fn("lsgan")

    for m in (None, mask):
        tm = None if m is None else torch.tensor(m)
        jr = my_d(jnp.asarray(r_c), jnp.asarray(r_u),
                  jnp.asarray(f_c), jnp.asarray(f_u),
                  None if m is None else jnp.asarray(m))
        tr = ref_d(torch.tensor(r_c), torch.tensor(r_u),
                   torch.tensor(f_c), torch.tensor(f_u), tm)
        np.testing.assert_allclose(np.asarray(jr[0]), tr[0].numpy(),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(jr[1]), tr[1].numpy(),
                                   rtol=1e-5)
        jg = my_g(jnp.asarray(f_c), jnp.asarray(f_u),
                  None if m is None else jnp.asarray(m))
        tg = ref_g(torch.tensor(f_c), torch.tensor(f_u), tm)
        np.testing.assert_allclose(np.asarray(jg), tg.numpy(), rtol=1e-5)


def test_unknown_adv_mode_raises():
    from cmtts_tpu.cm.gan_losses import get_adversarial_losses_fn

    with pytest.raises(NotImplementedError):
        get_adversarial_losses_fn("wgan")


def test_fm_loss_matches_reference_formula(ref_loss_mod):
    """get_fm_loss parity (model/loss.py:728-736), computed against the
    torch formula directly (instantiating DiffGANTTSLoss needs full
    configs; the formula is self-contained)."""
    import torch
    import torch.nn.functional as F

    from cmtts_tpu.cm.gan_losses import feature_matching_loss

    rng = np.random.RandomState(1)
    n_layers = 5  # n_layer(3) + n_cond_layer(2)
    shapes = [(2, 64, 40), (2, 128, 20), (2, 512, 10), (2, 128, 10),
              (2, 1, 10)]
    feats = {k: [rng.randn(*s).astype(np.float32) for s in shapes]
             for k in ("rc", "ru", "fc", "fu")}

    feat_weights = 4.0 / (n_layers + 1)
    want = 0.0
    for j in range(len(feats["fc"]) - 1):
        want += feat_weights * 0.5 * (
            F.l1_loss(torch.tensor(feats["rc"][j]),
                      torch.tensor(feats["fc"][j])).item()
            + F.l1_loss(torch.tensor(feats["ru"][j]),
                        torch.tensor(feats["fu"][j])).item())

    got = feature_matching_loss(
        [jnp.asarray(x) for x in feats["rc"]],
        [jnp.asarray(x) for x in feats["ru"]],
        [jnp.asarray(x) for x in feats["fc"]],
        [jnp.asarray(x) for x in feats["fu"]],
        n_layers)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_ssim_matches_reference(ref_loss_mod):
    import torch

    sys.path.insert(0, REF)
    try:
        import utils.tools as ref_tools
    finally:
        sys.path.remove(REF)
    # the reference ssim reads a module-level ``window`` cache that is
    # never initialized (utils/tools.py:863 NameErrors unless a caller
    # seeds it); seed it the way its first successful call would
    ref_tools.window = None
    ref_ssim = ref_tools.ssim

    from cmtts_tpu.cm.gan_losses import ssim_map

    rng = np.random.RandomState(2)
    a = rng.rand(2, 30, 16).astype(np.float32) * 4 + 2
    b = a + 0.3 * rng.randn(2, 30, 16).astype(np.float32)

    ref = ref_ssim(torch.tensor(a)[:, None], torch.tensor(b)[:, None],
                   size_average=False)  # (B, T, M) after channel mean
    got = ssim_map(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4)


def test_weighted_mel_l1_matches_reference_formula(ref_loss_mod):
    import torch
    import torch.nn.functional as F

    from cmtts_tpu.cm.gan_losses import weighted_mel_l1

    rng = np.random.RandomState(3)
    pred = rng.randn(2, 20, 8).astype(np.float32)
    tgt = rng.randn(2, 20, 8).astype(np.float32)
    tgt[0, 15:] = 0.0  # padding rows
    mel_valid = np.ones((2, 20), np.float32)
    mel_valid[0, 15:] = 0.0

    # reference l1_loss with weights_nonzero_speech (model/loss.py:737-750)
    tp = torch.tensor(pred) * torch.tensor(mel_valid)[..., None]
    tt = torch.tensor(tgt) * torch.tensor(mel_valid)[..., None]
    l1 = F.l1_loss(tp, tt, reduction="none")
    w = tt.abs().sum(-1, keepdim=True).ne(0).float().repeat(1, 1, 8)
    want = ((l1 * w).sum() / w.sum()).item()

    got = weighted_mel_l1(jnp.asarray(pred), jnp.asarray(tgt),
                          jnp.asarray(mel_valid))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


# ---------------------------------------------------------------------------
# JCU discriminator
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_cfg():
    from cmtts_tpu.core.config import load_yaml_configs, config_from_dicts

    p, m, t = load_yaml_configs("LJSpeech")
    m["transformer"]["encoder_layer"] = 1
    m["denoiser"]["residual_channels"] = 32
    m["discriminator"]["n_channels"] = [8, 16, 32, 16, 1]
    return config_from_dicts(p, m, t)


def test_jcu_discriminator_shapes_and_jit(tiny_cfg):
    from cmtts_tpu.models.discriminator import JCUDiscriminator

    d = JCUDiscriminator(tiny_cfg)
    B, T, M = 2, 40, tiny_cfg.stft.n_mel_channels
    rng = jax.random.PRNGKey(0)
    x_ts = jnp.zeros((B, T, M))
    x_prev = jnp.zeros((B, T, M))
    t_step = jnp.zeros((B,), jnp.int32)
    params = d.init(rng, x_ts, x_prev, None, t_step)["params"]

    cond, uncond = jax.jit(
        lambda p, a, b, t: d.apply({"params": p}, a, b, None, t)
    )(params, x_ts, x_prev, t_step)

    dc = tiny_cfg.model.discriminator
    assert len(cond) == dc.n_layer + dc.n_cond_layer
    assert len(uncond) == dc.n_layer + dc.n_uncond_layer
    # logits last, 1 channel; strides 1,2,2 -> T/4 after the trunk
    assert cond[-1].shape == (B, T // 4, 1)
    assert uncond[-1].shape == (B, T // 4, 1)
    # trunk features shared between branches
    for j in range(dc.n_layer):
        np.testing.assert_array_equal(np.asarray(cond[j]),
                                      np.asarray(uncond[j]))


def test_jcu_conditioning_changes_cond_branch_only(tiny_cfg):
    from cmtts_tpu.models.discriminator import JCUDiscriminator

    d = JCUDiscriminator(tiny_cfg)
    B, T, M = 2, 40, tiny_cfg.stft.n_mel_channels
    rng = np.random.RandomState(0)
    x_ts = jnp.asarray(rng.randn(B, T, M), jnp.float32)
    x_prev = jnp.asarray(rng.randn(B, T, M), jnp.float32)
    params = d.init(jax.random.PRNGKey(0), x_ts, x_prev, None,
                    jnp.zeros((B,), jnp.int32))["params"]

    c0, u0 = d.apply({"params": params}, x_ts, x_prev, None,
                     jnp.zeros((B,), jnp.int32))
    c1, u1 = d.apply({"params": params}, x_ts, x_prev, None,
                     jnp.full((B,), 3, jnp.int32))
    # diffusion step conditions ONLY the cond branch
    np.testing.assert_allclose(np.asarray(u0[-1]), np.asarray(u1[-1]))
    assert np.abs(np.asarray(c0[-1]) - np.asarray(c1[-1])).max() > 1e-6


def test_adversarial_training_signal(tiny_cfg):
    """One LSGAN D-step on random real/fake mels decreases the D loss —
    the losses, the discriminator, and the grads wire together."""
    import optax

    from cmtts_tpu.cm.gan_losses import lsgan_d_loss
    from cmtts_tpu.models.discriminator import JCUDiscriminator

    d = JCUDiscriminator(tiny_cfg)
    B, T, M = 4, 32, tiny_cfg.stft.n_mel_channels
    rng = np.random.RandomState(1)
    real = jnp.asarray(rng.randn(B, T, M), jnp.float32)
    fake = jnp.asarray(rng.randn(B, T, M) * 0.3, jnp.float32)
    prev = jnp.asarray(rng.randn(B, T, M), jnp.float32)
    t_step = jnp.zeros((B,), jnp.int32)
    params = d.init(jax.random.PRNGKey(0), real, prev, None, t_step)["params"]

    def d_loss(p):
        rc, ru = d.apply({"params": p}, real, prev, None, t_step)
        fc, fu = d.apply({"params": p}, fake, prev, None, t_step)
        r, f = lsgan_d_loss(rc[-1], ru[-1], fc[-1], fu[-1])
        return r + f

    tx = optax.adam(2e-4)
    opt_state = tx.init(params)
    l0, grads = jax.value_and_grad(d_loss)(params)
    updates, opt_state = tx.update(grads, opt_state)
    params2 = optax.apply_updates(params, updates)
    l1 = d_loss(params2)
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0


def test_diffsinger_and_diffgan_routing(tiny_cfg):
    """Loss routing: aux uses explicit mel L1, naive/shallow route the
    noise/coarse terms (model/loss.py:387-448, 629-697)."""
    from cmtts_tpu.cm.gan_losses import diffgan_recon_loss, diffsinger_loss
    from cmtts_tpu.text import sil_phonemes_ids

    cfg = tiny_cfg
    B, T_TXT, T_MEL, M = 2, 6, 20, cfg.stft.n_mel_channels
    rng = np.random.RandomState(4)
    cond_out = {
        "src_pad_mask": jnp.zeros((B, T_TXT), bool),
        "mel_pad_mask": jnp.zeros((B, T_MEL), bool),
        "log_d_pred": jnp.asarray(rng.randn(B, T_TXT), jnp.float32),
        "p_pred": {"cwt": jnp.asarray(rng.randn(B, T_MEL, 11), jnp.float32),
                   "f0_mean": jnp.zeros((B,)), "f0_std": jnp.ones((B,))},
        "e_pred": jnp.asarray(rng.randn(B, T_TXT), jnp.float32),
    }
    batch = {
        "texts": jnp.ones((B, T_TXT), jnp.int32),
        "d_targets": jnp.ones((B, T_TXT), jnp.int32),
        "mels": jnp.asarray(rng.randn(B, T_MEL, M), jnp.float32),
        "p_targets": {"cwt_spec": jnp.asarray(rng.randn(B, T_MEL, 10),
                                              jnp.float32),
                      "uv": jnp.zeros((B, T_MEL)),
                      "f0": jnp.zeros((B, T_MEL)),
                      "f0_mean": jnp.zeros((B,)),
                      "f0_std": jnp.ones((B,))},
        "e_targets": jnp.asarray(rng.randn(B, T_TXT), jnp.float32),
    }
    sil = tuple(sil_phonemes_ids())
    mel_pred = jnp.asarray(rng.randn(B, T_MEL, M), jnp.float32)

    tot_aux, parts_aux = diffsinger_loss(
        "diff_aux", cond_out, batch, cfg, sil, mel_pred=mel_pred)
    assert "mel" in parts_aux and np.isfinite(tot_aux)

    tot_naive, parts_naive = diffsinger_loss(
        "diff_naive", cond_out, batch, cfg, sil,
        noise_loss=jnp.asarray(0.7))
    assert np.isfinite(tot_naive) and "noise" in parts_naive
    with pytest.raises(NotImplementedError):
        diffsinger_loss("bogus", cond_out, batch, cfg, sil)

    recon, parts = diffgan_recon_loss(
        "aux", cond_out, batch, cfg, sil, [mel_pred, mel_pred])
    assert np.isfinite(recon) and "dur_pdur" in parts

    coarse = jnp.asarray(rng.randn(B, T_MEL, M), jnp.float32)
    recon_sh, parts_sh = diffgan_recon_loss(
        "shallow", cond_out, batch, cfg, sil, mel_pred, coarse_mels=coarse)
    # shallow freezes the variance adaptor: mel term only
    assert set(parts_sh) == {"mel"}
    np.testing.assert_allclose(np.asarray(recon_sh),
                               np.asarray(parts_sh["mel"]))

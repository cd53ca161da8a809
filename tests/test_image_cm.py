"""Image-domain CM: editing-op golden parity + sampling harness smoke.

The editing golden tests run one projection iteration with ``ts`` ending
at ``steps-1`` so the re-noising std is exactly 0 — the comparison then
covers the sigma schedule, the distiller call, the clamp, and the
measurement projection deterministically (reference
``karras_diffusion.py:894-1123``).
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF, "model", "cm_tool"))

STEPS = 40
TS = (10, STEPS - 1)  # single iteration, zero re-noise


@pytest.fixture(scope="module")
def ref_kd():
    """Import reference karras_diffusion with stubs for piq/mpi4py/..."""
    if not HAVE_REF:
        pytest.skip("reference snapshot not mounted")
    stubs = {
        "piq": {"LPIPS": object},
        "mpi4py": {"MPI": types.SimpleNamespace(COMM_WORLD=None)},
        "blobfile": {"BlobFile": object},
        "librosa": {}, "parselmouth": {}, "inflect": {"engine": lambda: None},
        "pycwt": {"wavelet": types.SimpleNamespace(MexicanHat=object, cwt=None)},
        "unidecode": {"unidecode": lambda s: s},
    }
    for name, attrs in stubs.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, REF)
    pkg = types.ModuleType("model")
    pkg.__path__ = [os.path.join(REF, "model")]
    sys.modules.setdefault("model", pkg)
    sub = types.ModuleType("model.cm_tool")
    sub.__path__ = [os.path.join(REF, "model", "cm_tool")]
    sys.modules.setdefault("model.cm_tool", sub)
    try:
        import model.cm_tool.karras_diffusion as kd
    finally:
        sys.path.remove(REF)
    return kd


class _ZeroGen:
    """generator stub: the editing loops multiply its noise by std=0."""

    def randn_like(self, x):
        import torch

        return torch.randn_like(x)


def _fake_distill_torch(x, t):
    import torch

    return torch.tanh(x) * 0.5


def _fake_distill_jax(x, sigma):
    return jnp.tanh(x) * 0.5


def _sched():
    from cmtts_tpu.cm.karras import KarrasSchedule

    return KarrasSchedule(sigma_min=0.002, sigma_max=80.0, rho=7.0)


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_colorization_matches_reference(ref_kd):
    import torch

    from cmtts_tpu.cm.image import iterative_colorization

    rng = np.random.RandomState(0)
    B, S = 2, 16
    images = rng.uniform(-1, 1, (B, 3, S, S)).astype(np.float32)
    x = rng.randn(B, 3, S, S).astype(np.float32)

    want_x, want_img = ref_kd.iterative_colorization(
        _fake_distill_torch, torch.tensor(images), torch.tensor(x),
        ts=TS, steps=STEPS, generator=_ZeroGen())

    got_x, got_img = iterative_colorization(
        _fake_distill_jax,
        jnp.asarray(np.transpose(images, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        TS, _sched(), jax.random.PRNGKey(0), steps=STEPS)

    np.testing.assert_allclose(_nchw(got_img), want_img.numpy(), atol=1e-5)
    np.testing.assert_allclose(_nchw(got_x), want_x.numpy(), atol=1e-5)


def test_superres_matches_reference(ref_kd):
    import torch

    from cmtts_tpu.cm.image import iterative_superres

    rng = np.random.RandomState(1)
    B, S = 2, 16
    images = rng.uniform(-1, 1, (B, 3, S, S)).astype(np.float32)
    x = rng.randn(B, 3, S, S).astype(np.float32)

    want_x, want_img = ref_kd.iterative_superres(
        _fake_distill_torch, torch.tensor(images), torch.tensor(x),
        ts=TS, steps=STEPS, generator=_ZeroGen())

    got_x, got_img = iterative_superres(
        _fake_distill_jax,
        jnp.asarray(np.transpose(images, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        TS, _sched(), jax.random.PRNGKey(0), steps=STEPS)

    np.testing.assert_allclose(_nchw(got_img), want_img.numpy(), atol=1e-5)
    np.testing.assert_allclose(_nchw(got_x), want_x.numpy(), atol=1e-5)


def test_inpainting_matches_reference(ref_kd):
    """Reference alternates keep-regions over GROUPS of 7 samples
    (its demo batch layout) and draws with arial; both sides are pinned
    to the same DejaVu glyph via monkeypatch, and rows are matched
    (ref row 0 = even group <-> ours row 0; ref row 7 <-> ours row 1)."""
    import PIL.ImageFont as ImageFont
    import torch

    from cmtts_tpu.cm.image import iterative_inpainting, letter_mask

    real_truetype = ImageFont.truetype
    font = "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf"
    if not os.path.exists(font):
        pytest.skip("no DejaVu font")
    ImageFont.truetype = lambda name, size: real_truetype(font, size)
    try:
        rng = np.random.RandomState(2)
        B, S = 14, 64
        images = rng.uniform(-1, 1, (B, 3, S, S)).astype(np.float32)
        x = rng.randn(B, 3, S, S).astype(np.float32)

        want_x, want_img = ref_kd.iterative_inpainting(
            _fake_distill_torch, torch.tensor(images), torch.tensor(x),
            ts=TS, steps=STEPS, generator=_ZeroGen())

        sel = [0, 7]  # one even-group row, one odd-group row
        mask = jnp.asarray(letter_mask(S, font_path=font))
        got_x, got_img = iterative_inpainting(
            _fake_distill_jax,
            jnp.asarray(np.transpose(images[sel], (0, 2, 3, 1))),
            jnp.asarray(np.transpose(x[sel], (0, 2, 3, 1))),
            TS, _sched(), jax.random.PRNGKey(0), steps=STEPS, mask=mask)

        np.testing.assert_allclose(_nchw(got_img), want_img.numpy()[sel],
                                   atol=1e-5)
        np.testing.assert_allclose(_nchw(got_x), want_x.numpy()[sel],
                                   atol=1e-5)
    finally:
        ImageFont.truetype = real_truetype


def test_karras_sample_image_smoke():
    """End-to-end sampling through a tiny random UNet for every sampler
    family (image_sample.py:68-90)."""
    from cmtts_tpu.cm.image import karras_sample_image, to_uint8
    from cmtts_tpu.models.unet import ImageUNet, UNetConfig

    cfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1,))
    model = ImageUNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.zeros((1,)))["params"]

    def apply_fn(p, x, t, y=None):
        return model.apply({"params": p}, x, t, y)

    sched = _sched()
    for sampler, kw in [("heun", dict(steps=3)), ("euler", dict(steps=3)),
                        ("dpm", dict(steps=3)),
                        ("ancestral", dict(steps=3)), ("onestep", {}),
                        ("our_multistep", dict(ts=(0, 0, 1))),
                        ("multistep", dict(ts=(0, 1, 2), steps=3))]:
        img = karras_sample_image(apply_fn, params, (2, 8, 8, 3),
                                  jax.random.PRNGKey(1), sched,
                                  sampler=sampler, **kw)
        assert img.shape == (2, 8, 8, 3)
        a = np.asarray(img)
        assert np.isfinite(a).all()
        # image entry clamps to [-1, 1] (karras_diffusion.py:477)
        assert a.min() >= -1.0 and a.max() <= 1.0
        u8 = to_uint8(img)
        assert u8.dtype == np.uint8

    with pytest.raises(ValueError):
        karras_sample_image(apply_fn, params, (1, 8, 8, 3),
                            jax.random.PRNGKey(1), sched, sampler="bogus")


def test_image_sample_cli_end_to_end(tmp_path):
    """Drive cli/image_sample.py with a random-init tiny model."""
    import subprocess

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "samples"
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "cli", "image_sample.py"),
         "--image_size", "64", "--num_channels", "32",
         "--num_res_blocks", "1", "--attention_resolutions", "32",
         "--num_samples", "2", "--batch_size", "2", "--sampler", "onestep",
         "--training_mode", "consistency_training",
         "--use_fp16", "False",  # reference-CLI compat flag, no-op here
         "--out_dir", str(out)],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    files = list(out.glob("samples_*.npz"))
    assert len(files) == 1
    arr = np.load(files[0])["arr_0"]
    assert arr.shape == (2, 64, 64, 3) and arr.dtype == np.uint8


def test_image_consistency_training_loss_decreases():
    """CT on a tiny UNet: fused step runs jitted, loss falls, EMA/target
    move (reference CMTrainLoop semantics over consistency_losses)."""
    import optax

    from cmtts_tpu.cm.image_train import make_image_train_step
    from cmtts_tpu.models.unet import ImageUNet, UNetConfig
    from cmtts_tpu.train.state import create_train_state

    cfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1,))
    model = ImageUNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.zeros((1,)))["params"]
    tx = optax.radam(1e-3)
    state = create_train_state(params, tx, n_ema=1)
    step = make_image_train_step(model, _sched(), num_scales=3, tx=tx,
                                 donate=False)

    rng = np.random.RandomState(0)
    batch = {"images": jnp.asarray(
        np.tile(rng.uniform(-1, 1, (1, 8, 8, 3)), (8, 1, 1, 1)),
        jnp.float32)}
    losses = []
    # fixed key -> fixed (noise, indices) each step: the CT objective
    # becomes a (slowly moving, EMA-target) regression the optimizer must
    # drive down; with fresh noise every step the loss is too stochastic
    # to assert a 30-step trend
    k = jax.random.PRNGKey(1)
    for i in range(30):
        state, m = step(state, batch, k, jnp.asarray(0.95))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert int(state.step) == 30


def test_image_consistency_distillation_runs():
    """CD with a frozen teacher produces finite per-sample losses."""
    import optax

    from cmtts_tpu.cm.image_train import make_image_train_step
    from cmtts_tpu.models.unet import ImageUNet, UNetConfig
    from cmtts_tpu.train.state import create_train_state

    cfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(), channel_mult=(1,))
    model = ImageUNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.zeros((1,)))["params"]
    tx = optax.radam(1e-3)
    state = create_train_state(params, tx, n_ema=1)
    step = make_image_train_step(model, _sched(), num_scales=4, tx=tx,
                                 teacher_params=params, loss_norm="l1",
                                 donate=False)
    batch = {"images": jnp.zeros((4, 8, 8, 3))}
    state, m = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0.95))
    assert np.isfinite(float(m["loss"]))

"""Golden parity: reference PyTorch CM-TTS vs cmtts_tpu, identical weights.

Instantiates the reference ``DurationPitchSpeakerNet`` + ``Denoiser``
(imported from the read-only snapshot — NOT copied), converts their
``state_dict`` with :mod:`cmtts_tpu.convert.from_torch`, and checks both
frameworks produce the same outputs on the same inputs.  This validates
the whole acoustic stack (encoder, variance adaptor incl. CWT pitch,
denoiser) and the checkpoint converter in one shot.

Skipped when the reference snapshot is not mounted.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference snapshot not mounted")

HID = 32
FILT = 32
N_LAYERS = 2
HEADS = 2
N_MELS = 16
DEN_LAYERS = 3
DEN_CH = 32
CWT_H = 8
E_MIN, E_MAX = -1.0, 2.0
B, T_TXT, T_MEL = 2, 8, 24


@pytest.fixture(scope="module")
def ref_modules(tmp_path_factory):
    """Import reference model modules with stubs for absent C-extensions."""
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
    # synthetic package: reference model/__init__.py pulls in the
    # TF DeepSpeaker stack; point "model" at the directory instead
    pkg = types.ModuleType("model")
    pkg.__path__ = [os.path.join(REF, "model")]
    sys.modules.setdefault("model", pkg)
    try:
        from model.cmtts import DurationPitchSpeakerNet
        from model.modules import Denoiser
    finally:
        sys.path.remove(REF)
    return DurationPitchSpeakerNet, Denoiser


def _ref_configs(tmp_path, multi_speaker: bool):
    stats_dir = tmp_path
    with open(os.path.join(stats_dir, "stats.json"), "w") as f:
        json.dump({"energy": [E_MIN, E_MAX, 0.0, 1.0]}, f)
    with open(os.path.join(stats_dir, "speakers.json"), "w") as f:
        json.dump({f"spk{i}": i for i in range(4)}, f)
    preprocess = {
        "path": {"preprocessed_path": str(stats_dir)},
        "preprocessing": {
            "mel": {"n_mel_channels": N_MELS},
            "pitch": {
                "pitch_type": "cwt", "use_uv": True, "pitch_ar": False,
                "pitch_norm": "log", "pitch_norm_eps": 1e-9,
                "f0_mean": 214.0, "f0_std": 63.0,
                "cwt_scales": list(np.exp2(np.arange(10)) * 0.01),
            },
            "energy": {"feature": "phoneme_level"},
            "speaker_embedder": "none",
        },
    }
    model = {
        "transformer": {
            "encoder_layer": N_LAYERS, "encoder_hidden": HID,
            "encoder_head": HEADS, "ffn_kernel_size": 9,
            "encoder_dropout": 0.1, "ffn_padding": "SAME", "ffn_act": "gelu",
        },
        "max_seq_len": 64,
        "multi_speaker": multi_speaker,
        "variance_embedding": {
            "use_pitch_embed": True, "use_energy_embed": True,
            "pitch_n_bins": 256, "energy_n_bins": 16,
            "energy_quantization": "linear",
        },
        "variance_predictor": {
            "predictor_grad": 0.1, "filter_size": FILT,
            "predictor_layers": 2, "dropout": 0.1, "predictor_kernel": 5,
            "dur_predictor_layers": 2, "dur_predictor_kernel": 3,
            "cwt_std_scale": 0.8, "cwt_hidden_size": CWT_H,
        },
        "denoiser": {"residual_channels": DEN_CH,
                     "residual_layers": DEN_LAYERS, "denoiser_dropout": 0.2},
        "external_speaker_dim": 512,
    }
    train = {"loss": {"dur_loss": "mse"}}
    return preprocess, model, train


def _our_config(multi_speaker: bool):
    from cmtts_tpu.core.config import (
        CMConfig, Config, DataConfig, DenoiserConfig, EnergyConfig,
        LossConfig, ModelConfig, PitchConfig, StftConfig, TrainConfig,
        TransformerConfig, VarianceEmbeddingConfig, VariancePredictorConfig)

    return Config(
        data=DataConfig(),
        stft=StftConfig(n_mel_channels=N_MELS),
        pitch=PitchConfig(pitch_type="cwt", use_uv=True, pitch_norm="log",
                          pitch_norm_eps=1e-9, f0_mean=214.0, f0_std=63.0),
        energy=EnergyConfig(feature="phoneme_level",
                            energy_min=E_MIN, energy_max=E_MAX),
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=N_LAYERS, encoder_head=HEADS,
                encoder_hidden=HID, ffn_kernel_size=9, encoder_dropout=0.1),
            denoiser=DenoiserConfig(residual_layers=DEN_LAYERS,
                                    residual_channels=DEN_CH),
            variance_predictor=VariancePredictorConfig(
                filter_size=FILT, predictor_layers=2, predictor_kernel=5,
                dur_predictor_layers=2, dur_predictor_kernel=3,
                predictor_grad=0.1, cwt_std_scale=0.8, cwt_hidden_size=CWT_H),
            variance_embedding=VarianceEmbeddingConfig(
                pitch_n_bins=256, energy_n_bins=16,
                energy_quantization="linear"),
            multi_speaker=multi_speaker,
            n_speakers=4,
            speaker_embedder="none",
            max_seq_len=64,
        ),
        train=TrainConfig(batch_size=2, loss=LossConfig(),
                          cm=CMConfig(start_scales=3)),
    )


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    texts = rng.randint(1, 80, (B, T_TXT)).astype(np.int64)
    src_lens = np.array([T_TXT, T_TXT - 3], np.int64)
    texts[1, -3:] = 0
    d = np.zeros((B, T_TXT), np.int64)
    for b in range(B):
        L = src_lens[b]
        base = T_MEL // L
        d[b, :L] = base
        d[b, L - 1] += T_MEL - base * L
    mel2ph = np.zeros((B, T_MEL), np.int64)
    for b in range(B):
        pos = 0
        for i in range(T_TXT):
            mel2ph[b, pos: pos + d[b, i]] = i + 1
            pos += d[b, i]
    return {
        "texts": texts, "src_lens": src_lens, "d": d, "mel2ph": mel2ph,
        "speakers": np.array([1, 3], np.int64),
        "e_targets": rng.rand(B, T_TXT).astype(np.float32) * 2 - 0.5,
        "cwt_spec": rng.randn(B, T_MEL, 10).astype(np.float32) * 0.3,
        "f0_mean": np.array([5.5, 6.0], np.float32),
        "f0_std": np.array([0.4, 0.5], np.float32),
        "uv": (rng.rand(B, T_MEL) > 0.7).astype(np.float32),
        "x_t": rng.randn(B, T_MEL, N_MELS).astype(np.float32),
        "t": np.array([3.1, 0.7], np.float32),
    }


@pytest.fixture(scope="module", params=[False, True],
                ids=["single_speaker", "multi_speaker"])
def parity_setup(request, ref_modules, tmp_path_factory):
    import torch

    multi = request.param
    DurationPitchSpeakerNet, Denoiser = ref_modules
    pre, mod, tr = _ref_configs(tmp_path_factory.mktemp("stats"), multi)
    args = types.SimpleNamespace(model="consistency_training")
    torch.manual_seed(0)
    cond_net = DurationPitchSpeakerNet(args, pre, mod, tr).eval()
    denoiser = Denoiser(pre, mod).eval()

    # check our vocab matches the reference's len(symbols)+1 embedding
    from cmtts_tpu.text.symbols import VOCAB_SIZE
    assert cond_net.text_encoder.embed_tokens.weight.shape[0] == VOCAB_SIZE

    sd = {**{k: v for k, v in cond_net.state_dict().items()},
          **{"net." + k: v for k, v in denoiser.state_dict().items()}}
    sd = {("duration_pitch_energy_net." + k if not k.startswith("net.") else k): v
          for k, v in sd.items()}
    sd = {k: v.detach().numpy() for k, v in sd.items()}

    cfg = _our_config(multi)
    from cmtts_tpu.convert.from_torch import convert_cm_state_dict
    params = convert_cm_state_dict(sd, cfg, strict=True)
    return cond_net, denoiser, cfg, params, multi


def _torch_cond(cond_net, b, multi, teacher_forced=True):
    import torch

    with torch.no_grad():
        kw = dict(
            speakers=torch.from_numpy(b["speakers"]),
            texts=torch.from_numpy(b["texts"]),
            src_lens=torch.from_numpy(b["src_lens"]),
            mels=torch.zeros(B, 1, T_MEL, N_MELS),
        )
        if teacher_forced:
            kw.update(
                mel_lens=torch.full((B,), T_MEL, dtype=torch.long),
                p_targets={
                    "pitch": None,
                    "f0": None,
                    "uv": torch.from_numpy(b["uv"]),
                    "cwt_spec": torch.from_numpy(b["cwt_spec"]),
                    "f0_mean": torch.from_numpy(b["f0_mean"]),
                    "f0_std": torch.from_numpy(b["f0_std"]),
                },
                e_targets=torch.from_numpy(b["e_targets"]),
                d_targets=torch.from_numpy(b["d"]),
                mel2phs=torch.from_numpy(b["mel2ph"]),
            )
        return cond_net(**kw)


def _our_cond(cfg, params, b, teacher_forced=True):
    import jax
    import jax.numpy as jnp

    from cmtts_tpu.models.cmtts import CMTTS

    model = CMTTS(cfg)
    kw = dict(
        speakers=jnp.asarray(b["speakers"], jnp.int32),
        texts=jnp.asarray(b["texts"], jnp.int32),
        src_lens=jnp.asarray(b["src_lens"], jnp.int32),
        t_mel=T_MEL,
        deterministic=True,
    )
    if teacher_forced:
        kw.update(
            mel2ph=jnp.asarray(b["mel2ph"], jnp.int32),
            d_targets=jnp.asarray(b["d"], jnp.int32),
            p_targets={
                "pitch": None, "f0": None,
                "uv": jnp.asarray(b["uv"]),
                "cwt_spec": jnp.asarray(b["cwt_spec"]),
                "f0_mean": jnp.asarray(b["f0_mean"]),
                "f0_std": jnp.asarray(b["f0_std"]),
            },
            e_targets=jnp.asarray(b["e_targets"]),
        )
    return CMTTS(cfg).apply({"params": params}, method=CMTTS.condition, **kw)


def test_cond_net_parity_teacher_forced(parity_setup):
    cond_net, _, cfg, params, multi = parity_setup
    b = _batch()
    ref = _torch_cond(cond_net, b, multi, teacher_forced=True)
    ours = _our_cond(cfg, params, b, teacher_forced=True)

    np.testing.assert_allclose(
        np.asarray(ours["log_d_pred"]), ref["log_d_predictions"].numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["e_pred"]), ref["e_predictions"].numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["p_pred"]["cwt"]), ref["p_predictions"]["cwt"].numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["p_pred"]["f0_mean"]),
        ref["p_predictions"]["f0_mean"].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["cond"]), ref["cond"].numpy(), rtol=1e-4, atol=2e-4)


def test_cond_net_parity_inference(parity_setup):
    cond_net, _, cfg, params, multi = parity_setup
    b = _batch(seed=1)
    ref = _torch_cond(cond_net, b, multi, teacher_forced=False)
    ours = _our_cond(cfg, params, b, teacher_forced=False)

    ref_lens = ref["mel_lens"].numpy()
    our_lens = np.asarray(ours["mel_lens"])
    np.testing.assert_array_equal(np.minimum(ref_lens, T_MEL), our_lens)
    L = int(min(ref["cond"].shape[1], T_MEL))
    np.testing.assert_allclose(
        np.asarray(ours["cond"])[:, :L], ref["cond"].numpy()[:, :L],
        rtol=1e-4, atol=2e-4)


def test_denoiser_parity(parity_setup):
    import torch

    cond_net, denoiser, cfg, params, multi = parity_setup
    b = _batch(seed=2)
    rng = np.random.RandomState(3)
    cond = rng.randn(B, T_MEL, HID).astype(np.float32)
    spk = rng.randn(B, HID).astype(np.float32)

    with torch.no_grad():
        ref_out = denoiser(
            mel=torch.from_numpy(b["x_t"]).unsqueeze(1).transpose(2, 3),
            diffusion_step=torch.from_numpy(b["t"]),
            conditioner=torch.from_numpy(cond).transpose(1, 2),
            speaker_emb=torch.from_numpy(spk),
        ).transpose(2, 3)[:, 0].numpy()

    import jax.numpy as jnp

    from cmtts_tpu.models.cmtts import CMTTS

    ours = CMTTS(cfg).apply(
        {"params": params}, jnp.asarray(b["x_t"]), jnp.asarray(b["t"]),
        jnp.asarray(cond), jnp.asarray(spk) if multi else None,
        method=CMTTS.denoise)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4, atol=1e-4)


def test_checkpoint_file_roundtrip(parity_setup, tmp_path):
    import torch

    cond_net, denoiser, cfg, params, multi = parity_setup
    sd = {**{"duration_pitch_energy_net." + k: v
             for k, v in cond_net.state_dict().items()},
          **{"net." + k: v for k, v in denoiser.state_dict().items()}}
    path = tmp_path / "model000123.pt"
    torch.save(sd, str(path))

    from cmtts_tpu.convert.from_torch import load_torch_cm_checkpoint
    params2 = load_torch_cm_checkpoint(str(path), cfg, strict=True)

    import jax
    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b_ in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

"""Golden parity: reference torch LDNet vs cmtts_tpu flax LDNet.

Instantiates the reference ``metrics/ld_model/LDNet.py`` modules from the
read-only snapshot with random weights (and randomized BN running stats),
converts the state_dict with :func:`convert_torch_ldnet`, and checks
``forward`` / ``average_inference`` / ``mean_listener_inference`` agree —
covering both MobileNet encoders, ffn+rnn decoders, the mean net, and
scalar/categorical output heads.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "metrics", "ld_model")),
    reason="reference snapshot not mounted")

CFG_V3_RNN = {
    "combine_mean_score": False,
    "output_type": "scalar",
    "use_mean_net": True,
    "mean_net_type": "rnn",
    "mean_net_rnn_dim": 8,
    "mean_net_dnn_dim": 8,
    "mean_net_output_type": "scalar",
    "mean_net_range_clipping": True,
    "num_judges": 6,
    "judge_emb_dim": 4,
    "activation": "ReLU",
    "encoder_type": "mobilenetv3",
    "encoder_bneck_configs": [
        [16, 3, 16, 16, True, "RE", 3, 1],
        [16, 3, 72, 24, False, "RE", 3, 1],
        [24, 5, 96, 40, True, "HS", 1, 1],
        [40, 5, 120, 40, True, "HS", 1, 1],
    ],
    "encoder_output_dim": 32,
    "decoder_type": "rnn",
    "decoder_rnn_dim": 8,
    "decoder_dnn_dim": 8,
    "range_clipping": True,
    "use_mean_listener": True,
}

CFG_V2_FFN = {
    "combine_mean_score": False,
    "output_type": "categorical",
    "use_mean_net": False,
    "num_judges": 5,
    "judge_emb_dim": 3,
    "activation": "ReLU",
    "encoder_type": "mobilenetv2",
    "encoder_conv_first_ch": 8,
    "encoder_conv_t": [1, 2],
    "encoder_conv_c": [8, 16],
    "encoder_conv_n": [1, 2],
    "encoder_conv_s": [3, 3],
    "encoder_output_dim": 24,
    "decoder_type": "ffn",
    "decoder_dnn_dim": 16,
    "range_clipping": False,
    "use_mean_listener": False,
}

B, T, D = 2, 9, 65


@pytest.fixture(scope="module")
def ref_ldnet_cls():
    """Import the reference LDNet class from the read-only snapshot."""
    sys.path.insert(0, REF)
    # 'metrics' package namespace pointing at the snapshot dir (its
    # __init__ is import-light but be defensive about sibling imports)
    pkg = types.ModuleType("metrics")
    pkg.__path__ = [os.path.join(REF, "metrics")]
    sys.modules.setdefault("metrics", pkg)
    try:
        from metrics.ld_model.LDNet import LDNet as TorchLDNet
        yield TorchLDNet
    finally:
        sys.path.remove(REF)


def _make_torch_model(TorchLDNet, config, seed):
    import torch

    torch.manual_seed(seed)
    model = TorchLDNet(config)
    # randomize BN running stats so the converter's stat mapping is
    # actually exercised (fresh stats are mean=0/var=1)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.5)
    model.eval()
    return model


def _flax_from_torch(model, config):
    from cmtts_tpu.metrics.ldnet import LDNet, convert_torch_ldnet

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, stats = convert_torch_ldnet(sd, config)
    flax_model = LDNet(config)
    return flax_model, {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("config,seed", [(CFG_V3_RNN, 0), (CFG_V2_FFN, 1)],
                         ids=["v3_rnn_meannet", "v2_ffn_categorical"])
def test_ldnet_forward_parity(ref_ldnet_cls, config, seed):
    import torch

    model = _make_torch_model(ref_ldnet_cls, config, seed)
    flax_model, variables = _flax_from_torch(model, config)

    rng = np.random.RandomState(seed)
    spec = rng.rand(B, T, D).astype(np.float32) * 3
    judge = rng.randint(0, config["num_judges"], size=B)

    with torch.no_grad():
        mean_t, ld_t = model(torch.tensor(spec), torch.tensor(judge))
    mean_j, ld_j = flax_model.apply(variables, spec, judge)

    np.testing.assert_allclose(np.asarray(ld_j), ld_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    if config["use_mean_net"]:
        np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
    else:
        assert mean_j is None and mean_t is None


@pytest.mark.parametrize("config,seed", [(CFG_V3_RNN, 2), (CFG_V2_FFN, 3)],
                         ids=["v3_rnn_meannet", "v2_ffn_categorical"])
def test_ldnet_average_inference_parity(ref_ldnet_cls, config, seed):
    import torch

    from cmtts_tpu.metrics.ldnet import LDNet

    model = _make_torch_model(ref_ldnet_cls, config, seed)
    flax_model, variables = _flax_from_torch(model, config)

    rng = np.random.RandomState(seed)
    spec = rng.rand(B, T, D).astype(np.float32) * 3

    with torch.no_grad():
        scores_t, post_t = model.average_inference(
            torch.tensor(spec), include_meanspk=False)
    scores_j, post_j = flax_model.apply(
        variables, spec, include_meanspk=False,
        method=LDNet.average_inference)

    np.testing.assert_allclose(np.asarray(scores_j), scores_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(post_j), post_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_ldnet_mean_listener_parity(ref_ldnet_cls):
    import torch

    from cmtts_tpu.metrics.ldnet import LDNet

    config = CFG_V3_RNN
    model = _make_torch_model(ref_ldnet_cls, config, 4)
    flax_model, variables = _flax_from_torch(model, config)

    rng = np.random.RandomState(4)
    spec = rng.rand(B, T, D).astype(np.float32) * 3
    with torch.no_grad():
        scores_t = model.mean_listener_inference(torch.tensor(spec))
    scores_j = flax_model.apply(variables, spec,
                                method=LDNet.mean_listener_inference)
    np.testing.assert_allclose(np.asarray(scores_j), scores_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_moscal_ld_roundtrip(ref_ldnet_cls, tmp_path):
    """End-to-end MOSCal.get_ld_mos from a saved (config.yml, model.pt)
    pair — the loader contract replacing the reference's hardcoded
    developer paths (metrics/mos.py:29-37)."""
    import torch
    import yaml

    from cmtts_tpu.metrics.mos import MOSCal, hamming_spectrum

    config = CFG_V3_RNN
    model = _make_torch_model(ref_ldnet_cls, config, 5)
    ckpt = tmp_path / "model-27000.pt"
    cfg_yml = tmp_path / "config.yml"
    torch.save(model.state_dict(), ckpt)
    with open(cfg_yml, "w") as f:
        yaml.safe_dump(config, f)

    rng = np.random.RandomState(5)
    wav = rng.randn(22500).astype(np.float32) * 0.2

    cal = MOSCal(ld_ckpt=str(ckpt), ld_config=str(cfg_yml))
    got = cal.get_ld_mos(wav)

    spec = hamming_spectrum(wav)
    with torch.no_grad():
        want, _ = model.average_inference(torch.tensor(spec[None]),
                                          include_meanspk=False)
    np.testing.assert_allclose(got, float(want.numpy()[0]),
                               rtol=1e-4, atol=1e-5)

    # missing assets -> informative error, not a crash
    with pytest.raises(RuntimeError, match="LDNet checkpoint unavailable"):
        MOSCal().get_ld_mos(wav)


def test_calonemodel_ld_mos_dispatch(ref_ldnet_cls, tmp_path):
    """ld_mos through the CalOneModel harness (reference
    all_metrics.py:494-528 dispatch + :745-824 CSV accumulation)."""
    import csv

    import torch
    import yaml

    from cmtts_tpu.audio.wavio import write_wav
    from cmtts_tpu.metrics.harness import CalOneModel

    config = CFG_V3_RNN
    model = _make_torch_model(ref_ldnet_cls, config, 6)
    ckpt = tmp_path / "model.pt"
    cfg_yml = tmp_path / "config.yml"
    torch.save(model.state_dict(), ckpt)
    with open(cfg_yml, "w") as f:
        yaml.safe_dump(config, f)

    rng = np.random.RandomState(6)
    raw = tmp_path / "raw"
    syn_root = tmp_path / "syn"
    step_dir = syn_root / "300000"
    raw.mkdir()
    step_dir.mkdir(parents=True)
    for i in range(2):
        wav = (rng.randn(22500) * 0.1).astype(np.float32)
        write_wav(str(raw / f"utt{i}.wav"), wav, 22500)
        write_wav(str(step_dir / f"utt{i}.wav"), wav, 22500)

    tool = CalOneModel(str(syn_root), raw_folder=str(raw),
                       data_type="LJSpeech", ld_ckpt=str(ckpt),
                       ld_config=str(cfg_yml), sampling_rate=22500)
    csv_path = tool.get_model_metrics_by_list(["ld_mos"])
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["train_step", "ld_mos"]
    val = float(rows[1][1])
    # range-clipped scalar head -> scores within [1, 5]
    assert 1.0 <= val <= 5.0

"""MBNet MOS mean-net: golden parity vs the reference torch model."""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.metrics.mos import (
    MBNetMeanNet,
    MOSCal,
    convert_torch_mbnet,
    hamming_spectrum,
)

REF = "/root/reference"
HAS_REF = os.path.isfile(os.path.join(REF, "metrics", "mb_model.py"))


def test_meannet_shapes():
    m = MBNetMeanNet()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 257)))
    out = m.apply(v, jnp.zeros((2, 12, 257)))
    assert out.shape == (2, 12)


def test_hamming_spectrum():
    wav = np.random.RandomState(0).randn(22500).astype(np.float32) * 0.1
    spec = hamming_spectrum(wav)
    assert spec.shape[1] == 257
    assert (spec >= 0).all()


def test_moscal_without_ckpt_raises():
    cal = MOSCal()
    with pytest.raises(RuntimeError, match="missing large blob"):
        cal.get_mb_mos(np.zeros(22500, np.float32))
    with pytest.raises(RuntimeError, match="LDNet"):
        cal.get_ld_mos(np.zeros(22500, np.float32))


@pytest.mark.skipif(not HAS_REF, reason="reference snapshot not mounted")
def test_mbnet_meannet_torch_parity(tmp_path):
    import torch

    pkg = types.ModuleType("metrics")
    pkg.__path__ = [os.path.join(REF, "metrics")]
    sys.modules.setdefault("metrics", pkg)
    sys.path.insert(0, REF)
    try:
        from metrics.mb_model import MBNet
    finally:
        sys.path.remove(REF)

    torch.manual_seed(0)
    ref = MBNet(num_judges=50).eval()
    spec = np.random.RandomState(0).rand(2, 9, 257).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.get_mean_mos(
            torch.from_numpy(spec).unsqueeze(1))[..., 0].numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, stats = convert_torch_mbnet(sd)
    ours = MBNetMeanNet().apply({"params": params, "batch_stats": stats},
                                jnp.asarray(spec))
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4,
                               atol=1e-5)

    # end-to-end loader path through a saved checkpoint file
    path = tmp_path / "model-50000.pt"
    torch.save(ref.state_dict(), str(path))
    cal = MOSCal(mb_ckpt=str(path))
    wav = np.random.RandomState(1).randn(22500).astype(np.float32) * 0.05
    score = cal.get_mb_mos(wav)
    assert np.isfinite(score)

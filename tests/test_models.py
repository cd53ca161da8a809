import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.models.cmtts import CMTTS
from cmtts_tpu.models.encoder import sinusoid_table, positions_from_mask
from cmtts_tpu.models.variance import dur_to_mel2ph, gather_by_mel2ph, grad_scale

from helpers import tiny_config, tiny_batch


def test_sinusoid_table_fairseq_layout():
    t = sinusoid_table(8, 6)
    assert t.shape == (8, 6)
    np.testing.assert_allclose(t[0], 0.0)  # padding row
    # [sin | cos] concat layout: first column sin(1), last column ~cos(small)
    assert abs(t[1, 0] - np.sin(1.0)) < 1e-6
    assert t[1, 5] > 0.99


def test_positions_from_mask():
    nonpad = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], dtype=bool)
    pos = np.asarray(positions_from_mask(nonpad))
    np.testing.assert_array_equal(pos, [[1, 2, 3, 0], [1, 2, 0, 0]])


def test_dur_to_mel2ph_golden():
    # reference docstring example (utils/tools.py:768-790):
    # dur [2,2,3] -> mel2ph [1,1,2,2,3,3,3]
    dur = jnp.asarray([[2, 2, 3]], dtype=jnp.float32)
    pad = jnp.zeros((1, 3), dtype=bool)
    m2p = np.asarray(dur_to_mel2ph(dur, pad, 9))
    np.testing.assert_array_equal(m2p[0], [1, 1, 2, 2, 3, 3, 3, 0, 0])


def test_gather_by_mel2ph():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    m2p = jnp.asarray([[1, 1, 3, 0]])
    out = np.asarray(gather_by_mel2ph(x, m2p))
    np.testing.assert_allclose(out[0, 0], [0, 1])
    np.testing.assert_allclose(out[0, 2], [4, 5])
    np.testing.assert_allclose(out[0, 3], [0, 0])  # padding -> zeros


def test_grad_scale():
    f = lambda x: grad_scale(x, 0.1).sum()
    g = jax.grad(f)(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(g), 0.1, rtol=1e-6)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = CMTTS(cfg)
    batch = tiny_batch()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(batch["mels"]),
        jnp.zeros(2),
        speakers=jnp.asarray(batch["speakers"]),
        texts=jnp.asarray(batch["texts"]),
        src_lens=jnp.asarray(batch["src_lens"]),
        mel2ph=jnp.asarray(batch["mel2ph"]),
        d_targets=jnp.asarray(batch["d_targets"]),
        p_targets={k: jnp.asarray(v) for k, v in batch["p_targets"].items()},
        e_targets=jnp.asarray(batch["e_targets"]),
        deterministic=True,
    )
    return cfg, model, variables, batch


def test_cmtts_training_forward(model_and_params):
    cfg, model, variables, batch = model_and_params
    out, cond_out = model.apply(
        variables,
        jnp.asarray(batch["mels"]),
        jnp.zeros(2),
        speakers=jnp.asarray(batch["speakers"]),
        texts=jnp.asarray(batch["texts"]),
        src_lens=jnp.asarray(batch["src_lens"]),
        mel2ph=jnp.asarray(batch["mel2ph"]),
        d_targets=jnp.asarray(batch["d_targets"]),
        p_targets={k: jnp.asarray(v) for k, v in batch["p_targets"].items()},
        e_targets=jnp.asarray(batch["e_targets"]),
        deterministic=True,
    )
    assert out.shape == batch["mels"].shape
    # zero-init output head -> exact zeros at init
    np.testing.assert_allclose(np.asarray(out), 0.0)
    assert cond_out["cond"].shape == (2, 24, 16)
    assert cond_out["log_d_pred"].shape == (2, 8)
    assert cond_out["p_pred"]["cwt"].shape == (2, 24, 11)
    assert cond_out["e_pred"].shape == (2, 8)


def test_cmtts_inference_condition(model_and_params):
    cfg, model, variables, batch = model_and_params
    cond_out = model.apply(
        variables,
        speakers=jnp.asarray(batch["speakers"]),
        texts=jnp.asarray(batch["texts"]),
        src_lens=jnp.asarray(batch["src_lens"]),
        t_mel=32,
        deterministic=True,
        method=CMTTS.condition,
    )
    assert cond_out["cond"].shape == (2, 32, 16)
    assert cond_out["mel_lens"].shape == (2,)
    # predicted durations at init: log_d = 0 -> dur = round(e^0 - 1) = 0
    assert int(cond_out["mel_lens"][0]) >= 0


def test_cmtts_jit_and_nonzero_after_perturb(model_and_params):
    cfg, model, variables, batch = model_and_params
    # perturb the zero-init output head so the denoiser produces signal
    params = variables["params"]
    flat = jax.tree_util.tree_map(lambda x: x, params)
    denoiser_out = flat["denoiser"]["out_proj"]["kernel"]
    flat["denoiser"]["out_proj"]["kernel"] = jnp.ones_like(denoiser_out) * 0.01
    variables2 = {**variables, "params": flat}

    @jax.jit
    def fwd(v, mels):
        out, _ = CMTTS(cfg).apply(
            v, mels, jnp.zeros(2),
            speakers=jnp.asarray(batch["speakers"]),
            texts=jnp.asarray(batch["texts"]),
            src_lens=jnp.asarray(batch["src_lens"]),
            mel2ph=jnp.asarray(batch["mel2ph"]),
            d_targets=jnp.asarray(batch["d_targets"]),
            p_targets={k: jnp.asarray(v2) for k, v2 in batch["p_targets"].items()},
            e_targets=jnp.asarray(batch["e_targets"]),
            deterministic=True,
        )
        return out

    out = fwd(variables2, jnp.asarray(batch["mels"]))
    assert np.abs(np.asarray(out)).max() > 0


def test_multi_speaker_table():
    cfg = tiny_config(multi_speaker=True)
    model = CMTTS(cfg)
    batch = tiny_batch()
    rng = jax.random.PRNGKey(1)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(batch["mels"]), jnp.zeros(2),
        speakers=jnp.asarray(batch["speakers"]),
        texts=jnp.asarray(batch["texts"]),
        src_lens=jnp.asarray(batch["src_lens"]),
        mel2ph=jnp.asarray(batch["mel2ph"]),
        d_targets=jnp.asarray(batch["d_targets"]),
        p_targets={k: jnp.asarray(v) for k, v in batch["p_targets"].items()},
        e_targets=jnp.asarray(batch["e_targets"]),
        deterministic=True,
    )
    assert "speaker_emb" in variables["params"]


def test_ph_pitch_type_forward():
    """Phoneme-level pitch branch (reference modules.py:261-274)."""
    import jax
    import jax.numpy as jnp

    from cmtts_tpu.models.cmtts import CMTTS
    from helpers import tiny_config

    cfg = tiny_config(pitch_type="ph")
    model = CMTTS(cfg)
    B, T_txt, T_mel = 2, 6, 18
    rng = jax.random.PRNGKey(0)
    texts = jnp.ones((B, T_txt), jnp.int32) * 5
    src_lens = jnp.full((B,), T_txt, jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng},
        speakers=jnp.zeros(B, jnp.int32), texts=texts, src_lens=src_lens,
        t_mel=T_mel, deterministic=True, method=CMTTS.condition)
    out = model.apply(
        {"params": variables["params"]},
        speakers=jnp.zeros(B, jnp.int32), texts=texts, src_lens=src_lens,
        t_mel=T_mel, deterministic=True, method=CMTTS.condition)
    assert out["cond"].shape == (B, T_mel, cfg.model.transformer.encoder_hidden)
    assert out["p_pred"]["pitch_pred"].shape == (B, T_txt, 1)
    assert out["p_pred"]["cwt"] is None


def test_denoiser_scan_unroll_equivalent():
    """scan_unroll is an execution-schedule knob only: unrolled and
    sequential residual stacks must produce identical outputs from the
    same (stacked) parameters."""
    import dataclasses

    from cmtts_tpu.core.config import DenoiserConfig
    from cmtts_tpu.models.denoiser import Denoiser

    cfg1 = DenoiserConfig(residual_layers=4, residual_channels=16,
                          scan_unroll=1)
    cfg4 = dataclasses.replace(cfg1, scan_unroll=4)
    B, L, M = 2, 12, 80
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (B, L, M))
    t = jnp.asarray([0.5, 2.0])
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (B, L, 16))
    params = Denoiser(cfg1).init(rng, x, t, cond)["params"]
    y1 = Denoiser(cfg1).apply({"params": params}, x, t, cond)
    y4 = Denoiser(cfg4).apply({"params": params}, x, t, cond)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y4))

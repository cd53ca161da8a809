"""EDM diffusion-teacher training + true consistency distillation.

Covers the round-5 additions: the ``edm`` training mode (reference
``KarrasDenoiser.training_losses``, karras_diffusion.py:104-137, with
lognormal sigmas per resample.py:240-260), the non-boundary teacher
schedule for CD against a diffusion teacher, and the run-config sidecar
(ADVICE r4: graph-affecting flags must travel with the checkpoint).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.cm.karras import KarrasSchedule
from cmtts_tpu.models.cmtts import CMTTS
from cmtts_tpu.train.loop import make_train_step, schedule_from_config
from cmtts_tpu.train.state import create_train_state, make_optimizer

from helpers import tiny_batch, tiny_config


def _setup(cfg):
    model = CMTTS(cfg)
    batch_np = tiny_batch()
    batch = {
        k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
        for k, v in batch_np.items() if k != "p_targets" and v is not None
    }
    batch["p_targets"] = {k: jnp.asarray(v)
                          for k, v in batch_np["p_targets"].items()}
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch["mels"], jnp.zeros(2),
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mel2ph=batch["mel2ph"],
        d_targets=batch["d_targets"], p_targets=batch["p_targets"],
        e_targets=batch["e_targets"], deterministic=True)
    tx = make_optimizer(1e-4)
    state = create_train_state(variables["params"], tx, n_ema=3)
    return model, tx, state, batch


def test_edm_schedule_uses_plain_scalings():
    cfg = tiny_config(training_mode="edm")
    sched = schedule_from_config(cfg)
    assert sched.distillation is False
    # plain scalings are the identity-free EDM ones: at sigma_min the
    # boundary scalings give exactly (1, 0, .), the plain ones do not
    c_skip_b, c_out_b, _ = sched.boundary_scalings(jnp.asarray(sched.sigma_min))
    c_skip_p, c_out_p, _ = sched.scalings(jnp.asarray(sched.sigma_min))
    assert float(c_skip_b) == pytest.approx(1.0)
    assert float(c_out_b) == pytest.approx(0.0)
    assert float(c_skip_p) < 1.0 and float(c_out_p) > 0.0


def test_edm_train_step_runs_and_updates():
    cfg = tiny_config(training_mode="edm", weight_schedule="karras")
    model, tx, state, batch = _setup(cfg)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    probs = jnp.full((2,), 0.5)  # unused by edm mode
    state2, metrics = step(state, batch, probs, jax.random.PRNGKey(7),
                           jnp.asarray(0.95))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["cm_loss"]))
    # edm 'indices' carry CONTINUOUS lognormal sigmas inside the grid
    sig = np.asarray(metrics["indices"])
    assert sig.dtype.kind == "f"
    assert (sig >= cfg.train.cm.sigma_min).all()
    assert (sig <= cfg.train.cm.sigma_max).all()
    # no per-grid-index curve metrics in edm mode (continuous sigmas)
    assert not any(k.startswith("cm_i") for k in metrics)
    p0 = state.params["denoiser"]["out_proj"]["kernel"]
    p1 = state2.params["denoiser"]["out_proj"]["kernel"]
    assert np.abs(np.asarray(p1 - p0)).max() > 0


def test_edm_loss_decreases_with_identity_denoiser():
    """Sanity on the loss itself: denoising toward x0 lowers the loss vs
    predicting garbage — checked through the weighting math."""
    from cmtts_tpu.cm.karras import get_weightings

    sched = KarrasSchedule(distillation=False)
    sig = jnp.asarray([0.5, 1.0])
    w = get_weightings("karras", sched.snr(sig), sched.sigma_data)
    # karras weighting = 1/sigma^2 + 1/sigma_data^2
    np.testing.assert_allclose(
        np.asarray(w), 1.0 / np.asarray(sig) ** 2 + 1.0 / 0.5 ** 2, rtol=1e-6)


def test_cd_with_edm_teacher_sched():
    """Consistency distillation driven by a frozen 'diffusion teacher':
    the teacher closure must use plain EDM scalings while the student
    uses boundary scalings."""
    cfg = tiny_config(training_mode="consistency_distillation")
    model, tx, state, batch = _setup(cfg)
    teacher_params = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), state.params)
    teacher_sched = dataclasses.replace(
        schedule_from_config(cfg), distillation=False)
    assert schedule_from_config(cfg).distillation is True
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                           teacher_params=teacher_params,
                           teacher_sched=teacher_sched)
    probs = jnp.full((2,), 0.5)
    state2, metrics = step(state, batch, probs, jax.random.PRNGKey(7),
                           jnp.asarray(0.95))
    assert np.isfinite(float(metrics["loss"]))
    # distinct teacher scalings must change the loss vs boundary-scaled
    # teacher (same rng, same params)
    step_b = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                             teacher_params=teacher_params)
    _, metrics_b = step_b(state, batch, probs, jax.random.PRNGKey(7),
                          jnp.asarray(0.95))
    assert float(metrics["cm_loss"]) != pytest.approx(
        float(metrics_b["cm_loss"]))


def test_per_index_loss_curve_metrics():
    cfg = tiny_config()
    model, tx, state, batch = _setup(cfg)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    probs = jnp.full((2,), 0.5)
    _, metrics = step(state, batch, probs, jax.random.PRNGKey(3),
                      jnp.asarray(0.95))
    # start_scales=3 -> grid indices {0, 1}; sum/cnt pairs present and
    # consistent with the per-sample values
    assert "cm_i0_sum" in metrics and "cm_i1_cnt" in metrics
    idx = np.asarray(metrics["indices"])
    cm = np.asarray(metrics["loss_per_sample"])  # noqa: F841 (shape check)
    total_cnt = float(metrics["cm_i0_cnt"]) + float(metrics["cm_i1_cnt"])
    assert total_cnt == pytest.approx(len(idx))


def test_run_config_sidecar_roundtrip(tmp_path):
    from cmtts_tpu.train.checkpoint import read_run_config, write_run_config

    base = str(tmp_path / "ckpt")
    assert read_run_config(base) == {}
    write_run_config(base, {"training_mode": "edm", "cwt_masked_std": True})
    rc = read_run_config(base)
    assert rc["training_mode"] == "edm"
    assert rc["cwt_masked_std"] is True

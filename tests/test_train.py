import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.models.cmtts import CMTTS
from cmtts_tpu.train.ema import create_ema_and_scales_fn
from cmtts_tpu.train.loop import make_train_step, make_synthesize_step
from cmtts_tpu.train.resample import (
    Linear12Sampler,
    Linear21Sampler,
    LossSecondMomentSampler,
    UniformSampler,
    create_schedule_sampler,
)
from cmtts_tpu.train.state import create_train_state, make_optimizer

from helpers import tiny_batch, tiny_config


def test_schedule_samplers():
    s = create_schedule_sampler("linear12", 3)
    assert isinstance(s, Linear12Sampler)
    np.testing.assert_allclose(s.weights(), [1, 2])
    np.testing.assert_allclose(s.probs(), [1 / 3, 2 / 3])

    s = create_schedule_sampler("linear21", 4)
    np.testing.assert_allclose(s.weights(), [3, 2, 1])

    s = create_schedule_sampler("uniform", 4)
    np.testing.assert_allclose(s.probs(), [1 / 3] * 3)


def test_lsm_sampler_warmup_and_weights():
    s = LossSecondMomentSampler(3, history_per_term=2)
    # not warmed up: uniform
    np.testing.assert_allclose(s.probs(), [0.5, 0.5])
    s.update(np.array([0, 0]), np.array([1.0, 1.0]))
    s.update(np.array([1, 1]), np.array([3.0, 3.0]))
    assert s._warmed_up()
    p = s.probs()
    # index 1 has larger second moment -> higher probability
    assert p[1] > p[0]
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
    # rolling history: old entries shift out
    s.update(np.array([0]), np.array([100.0]))
    assert s._history[0, -1] == 100.0


def test_ema_and_scales_fn():
    f = create_ema_and_scales_fn("fixed", 0.95, "fixed", 3, 200, 800000, 10)
    assert f(0) == (0.95, 3)
    assert f(500000) == (0.95, 3)
    f2 = create_ema_and_scales_fn("fixed", 0.95, "progressive", 2, 150, 1000, 10)
    ema0, s0 = f2(0)
    ema1, s1 = f2(1000)
    assert s1 > s0
    assert ema0 == 0.95


@pytest.fixture(scope="module")
def train_setup():
    cfg = tiny_config()
    model = CMTTS(cfg)
    batch_np = tiny_batch()
    batch = {
        k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
        for k, v in batch_np.items() if k != "p_targets" and v is not None
    }
    batch["p_targets"] = {k: jnp.asarray(v) for k, v in batch_np["p_targets"].items()}
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
    return cfg, model, tx, state, batch


def test_train_step_runs_and_updates(train_setup):
    cfg, model, tx, state, batch = train_setup
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    sampler = create_schedule_sampler("linear12", 3)
    probs = jnp.asarray(sampler.probs())
    rng = jax.random.PRNGKey(42)

    state2, metrics = step(state, batch, probs, rng, jnp.asarray(0.95))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["cm_loss"]))
    assert metrics["indices"].shape == (2,)
    assert (np.asarray(metrics["indices"]) < 2).all()
    assert metrics["loss_per_sample"].shape == (2,)

    # params changed, target moved toward new params with rate 0.95
    # (use the output head: its zero init means gradients reach it first)
    p0 = state.params["denoiser"]["out_proj"]["kernel"]
    p1 = state2.params["denoiser"]["out_proj"]["kernel"]
    assert np.abs(np.asarray(p1 - p0)).max() > 0
    t1 = state2.target_params["denoiser"]["out_proj"]["kernel"]
    expected = 0.95 * np.asarray(p0) + 0.05 * np.asarray(p1)
    np.testing.assert_allclose(np.asarray(t1), expected, rtol=1e-5, atol=1e-7)

    # EMA rates applied per snapshot
    e0 = state2.ema_params[0]["denoiser"]["out_proj"]["kernel"]
    expected_e = 0.999 * np.asarray(p0) + 0.001 * np.asarray(p1)
    np.testing.assert_allclose(np.asarray(e0), expected_e, rtol=1e-5, atol=1e-7)


def test_train_step_bf16_compute(train_setup):
    """compute_dtype=bf16: forward in bfloat16 with f32 master params —
    loss lands near the f32 loss, grads flow, all state stays f32."""
    cfg, model, tx, state, batch = train_setup
    rng = jax.random.PRNGKey(42)
    probs = jnp.asarray(create_schedule_sampler("linear12", 3).probs())

    step32 = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    _, m32 = step32(state, batch, probs, rng, jnp.asarray(0.95))

    step16 = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                             compute_dtype=jnp.bfloat16)
    s16, m16 = step16(state, batch, probs, rng, jnp.asarray(0.95))

    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.05
    # master params / optimizer / EMA remain f32 and actually moved
    leaves = jax.tree_util.tree_leaves(
        (s16.params, s16.ema_params, s16.target_params))
    assert all(a.dtype == jnp.float32 for a in leaves)
    p0 = state.params["denoiser"]["out_proj"]["kernel"]
    p1 = s16.params["denoiser"]["out_proj"]["kernel"]
    assert np.abs(np.asarray(p1 - p0)).max() > 0


def test_train_step_with_donation(train_setup):
    """The production path donates the whole state (donate_argnums=(0,)).

    XLA rejects the same buffer donated twice, so create_train_state must
    produce REAL copies for ema/target — aliased pytrees fail at Execute()
    with `INVALID_ARGUMENT: Attempt to donate the same buffer twice`."""
    cfg, model, tx, state, batch = train_setup
    # donation invalidates input buffers — don't eat the shared fixture's
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                    state.params)
    state = create_train_state(params, tx, n_ema=3)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=True)
    probs = jnp.asarray(create_schedule_sampler("linear12", 3).probs())
    state2, metrics = step(state, batch, probs, jax.random.PRNGKey(1),
                           jnp.asarray(0.95))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_loss_decreases_over_steps(train_setup):
    cfg, model, tx_unused, state, batch = train_setup
    # higher lr than the production 1e-4 so a few steps show progress
    tx = make_optimizer(3e-3)
    from cmtts_tpu.train.state import create_train_state
    state = create_train_state(state.params, tx, n_ema=3)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    # FIXED rng every step -> deterministic objective, so optimization
    # must reduce it (random noise/indices would dominate otherwise)
    sub = jax.random.PRNGKey(7)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, probs, sub, jnp.asarray(0.5))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_consistency_distillation_step(train_setup):
    """CD: Heun step against a frozen teacher (reference
    karras_diffusion.py:174-192)."""
    cfg, model, tx, state, batch = train_setup
    import dataclasses
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, cm=dataclasses.replace(
            cfg.train.cm, training_mode="consistency_distillation")))
    teacher = jax.tree_util.tree_map(
        lambda x: x + 0.01, state.params)  # a distinct frozen teacher
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                           teacher_params=teacher)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    st2, metrics = step(state, batch, probs, jax.random.PRNGKey(3),
                        jnp.asarray(0.95))
    assert np.isfinite(float(metrics["loss"]))

    # missing teacher must fail fast
    with pytest.raises(ValueError, match="teacher_params"):
        make_train_step(model, cfg, tx, num_scales=3, donate=False)


def test_cd_student_from_teacher_survives_donation(train_setup):
    """The CLI initializes the CD student FROM the teacher params; with
    buffer donation on (the production path) the student state must be
    a COPY — aliasing would delete the frozen teacher's arrays after
    the first step (regression: train_cm.py student-from-teacher)."""
    cfg, model, tx, state, batch = train_setup
    import dataclasses
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, cm=dataclasses.replace(
            cfg.train.cm, training_mode="consistency_distillation")))
    from cmtts_tpu.train.state import create_train_state
    teacher = jax.tree_util.tree_map(jnp.asarray, state.params)
    st = create_train_state(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), teacher),
        tx, n_ema=3)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=True,
                           teacher_params=teacher)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    st, m1 = step(st, batch, probs, jax.random.PRNGKey(3), jnp.asarray(0.95))
    # a second step still reads the (undonated) teacher
    st, m2 = step(st, batch, probs, jax.random.PRNGKey(4), jnp.asarray(0.95))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_progdist_step(train_setup):
    """Progressive distillation (reference karras_diffusion.py:299-390)."""
    cfg, model, tx, state, batch = train_setup
    import dataclasses
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, cm=dataclasses.replace(
            cfg.train.cm, training_mode="progdist")))
    teacher = state.params
    step = make_train_step(model, cfg, tx, num_scales=4, donate=False,
                           teacher_params=teacher)
    probs = jnp.asarray(create_schedule_sampler("uniform", 5).probs())
    st2, metrics = step(state, batch, probs, jax.random.PRNGKey(4),
                        jnp.asarray(1.0))
    assert np.isfinite(float(metrics["loss"]))
    assert (np.asarray(metrics["indices"]) < 4).all()


def test_remat_train_step_matches(train_setup):
    """jax.checkpoint rematerialization must not change the math."""
    cfg, model, tx, state, batch = train_setup
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    rng = jax.random.PRNGKey(11)
    base = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    rem = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                          remat=True)
    _, m1 = base(state, batch, probs, rng, jnp.asarray(0.95))
    _, m2 = rem(state, batch, probs, rng, jnp.asarray(0.95))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)


def test_synthesize_step(train_setup):
    cfg, model, tx, state, batch = train_setup
    synth = make_synthesize_step(model, cfg)
    mel, mel_loss = synth(state.target_params, batch, jax.random.PRNGKey(0))
    assert mel.shape == batch["mels"].shape
    assert np.isfinite(float(mel_loss))


def _zero_dropout(cfg):
    import dataclasses
    mc = cfg.model
    mc = dataclasses.replace(
        mc,
        transformer=dataclasses.replace(
            mc.transformer, encoder_dropout=0.0, decoder_dropout=0.0),
        denoiser=dataclasses.replace(mc.denoiser, denoiser_dropout=0.0),
        variance_predictor=dataclasses.replace(
            mc.variance_predictor, dropout=0.0),
    )
    return dataclasses.replace(cfg, model=mc)


def _batch4(T_txt=8, T_mel=24, n_mels=16):
    """B=4 batch with UNIFORM lengths (no padding): batch-level masked
    means then decompose exactly across microbatches, so accumulation
    equality can be asserted bitwise-tight.  (With ragged lengths the
    per-microbatch masked-mean renormalization differs by design — same
    as the reference's per-microbatch means under DDP no_sync.)"""
    B = 4
    rng = np.random.RandomState(3)
    texts = rng.randint(1, 300, (B, T_txt)).astype(np.int32)
    src_lens = np.full(B, T_txt, np.int32)
    d = np.full((B, T_txt), T_mel // T_txt, np.int32)
    d[:, -1] += T_mel - d.sum(1)[0]
    mel2ph = np.zeros((B, T_mel), np.int32)
    for b in range(B):
        pos = 0
        for i in range(T_txt):
            mel2ph[b, pos:pos + d[b, i]] = i + 1
            pos += d[b, i]
    return {
        "speakers": jnp.zeros(B, jnp.int32),
        "texts": jnp.asarray(texts),
        "src_lens": jnp.asarray(src_lens),
        "mels": jnp.asarray(rng.randn(B, T_mel, n_mels).astype(np.float32)),
        "mel_lens": jnp.full(B, T_mel, jnp.int32),
        "mel2ph": jnp.asarray(mel2ph),
        "d_targets": jnp.asarray(d),
        "e_targets": jnp.asarray(rng.rand(B, T_txt).astype(np.float32)),
        "p_targets": {
            "pitch": jnp.asarray(
                rng.randint(1, 255, (B, T_mel)).astype(np.int32)),
            "f0": jnp.asarray(rng.rand(B, T_mel).astype(np.float32) * 2),
            "uv": jnp.asarray((rng.rand(B, T_mel) > 0.7).astype(np.float32)),
            "cwt_spec": jnp.asarray(
                rng.randn(B, T_mel, 10).astype(np.float32)),
            "f0_mean": jnp.asarray((5 + rng.rand(B)).astype(np.float32)),
            "f0_std": jnp.asarray((0.5 + rng.rand(B)).astype(np.float32)),
        },
        "spker_embeds": None,
    }


def test_microbatch_interleave_roundtrip():
    """The interleave/restore convention used by make_train_step:
    microbatch i == batch[i::k]; restore returns original order."""
    B, k = 8, 4
    x = jnp.arange(B)
    mb = jnp.moveaxis(x.reshape(B // k, k), 1, 0)
    for i in range(k):
        np.testing.assert_array_equal(np.asarray(mb[i]), np.asarray(x)[i::k])
    back = jnp.moveaxis(mb, 0, 1).reshape(B)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_microbatch_grad_accumulation_matches_full_batch():
    """accum over lax.scan microbatches == one full-batch step (reference
    `microbatch` config + DDP no_sync, train_util.py:805-879).

    Exact-equality conditions: dropout zeroed, uniform sampler (importance
    weights all 1 — per-sample weights pairing with the per-microbatch
    scalar tts loss is the one reference-faithful coupling that does not
    decompose), uniform sample lengths (masked means decompose)."""
    cfg = _zero_dropout(tiny_config())
    model = CMTTS(cfg)
    batch = _batch4()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch["mels"], jnp.zeros(4),
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mel2ph=batch["mel2ph"],
        d_targets=batch["d_targets"], p_targets=batch["p_targets"],
        e_targets=batch["e_targets"], deterministic=True)
    tx = make_optimizer(1e-4)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    srng = jax.random.PRNGKey(9)

    results = {}
    for mb in (-1, 2, 1):
        state = create_train_state(variables["params"], tx, n_ema=3)
        step = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                               microbatch=mb)
        st2, metrics = step(state, batch, probs, srng, jnp.asarray(0.95))
        results[mb] = (st2, metrics)

    st_full, m_full = results[-1]
    for mb in (2, 1):
        st_mb, m_mb = results[mb]
        np.testing.assert_allclose(float(m_mb["loss"]), float(m_full["loss"]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(m_mb["indices"]),
                                      np.asarray(m_full["indices"]))
        # per-sample totals: the cm part decomposes exactly; the tts part
        # is a per-microbatch scalar (reference parity), so compare means
        np.testing.assert_allclose(
            float(np.mean(np.asarray(m_mb["loss_per_sample"]))),
            float(np.mean(np.asarray(m_full["loss_per_sample"]))), rtol=1e-5)
        # accumulated grads == full-batch grads => identical RAdam update
        leaves_a = jax.tree_util.tree_leaves(st_mb.params)
        leaves_b = jax.tree_util.tree_leaves(st_full.params)
        for la, lb in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(m_mb["grad_norm"]),
                                   float(m_full["grad_norm"]), rtol=1e-4)


def test_microbatch_indivisible_raises():
    cfg = _zero_dropout(tiny_config())
    model = CMTTS(cfg)
    batch = _batch4()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch["mels"], jnp.zeros(4),
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mel2ph=batch["mel2ph"],
        d_targets=batch["d_targets"], p_targets=batch["p_targets"],
        e_targets=batch["e_targets"], deterministic=True)
    tx = make_optimizer(1e-4)
    state = create_train_state(variables["params"], tx, n_ema=3)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                           microbatch=3)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    with pytest.raises(ValueError, match="not divisible"):
        step(state, batch, probs, jax.random.PRNGKey(1), jnp.asarray(0.95))


def test_scan_steps_matches_sequential(train_setup):
    """The K-step on-device driver (scan_steps=K) must produce the same
    state as K sequential single-step dispatches with the same per-step
    rng stream (the scan splits rng exactly like the host loop would)."""
    cfg, model, tx, state, batch = train_setup
    K = 3
    step1 = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    stepK = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                            scan_steps=K)
    probs = jnp.asarray(create_schedule_sampler("linear12", 3).probs())
    rng = jax.random.PRNGKey(7)
    emas = jnp.asarray([0.95, 0.95, 0.95])
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * K), batch)

    sK, mK = stepK(state, stacked, probs, rng, emas)

    rngs = jax.random.split(rng, K)
    s = state
    for i in range(K):
        s, m1 = step1(s, batch, probs, rngs[i], jnp.asarray(0.95))

    assert int(sK.step) == int(s.step)
    assert mK["loss"].shape == (K,)
    assert mK["indices"].shape == (K, 2)
    assert mK["loss_per_sample"].shape == (K, 2)
    np.testing.assert_allclose(float(mK["loss"][-1]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(sK.params),
                    jax.tree_util.tree_leaves(s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(sK.target_params),
                    jax.tree_util.tree_leaves(s.target_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
def test_kvlogger_figure_and_audio_tb(tmp_path):
    """The TB sink records image and audio summaries (reference
    utils/tools.py:610-687 figure/audio logging surface)."""
    import numpy as np

    from cmtts_tpu.train.kvlogger import KVLogger
    from cmtts_tpu.utils_plot import mel_comparison_figure

    logger = KVLogger(str(tmp_path), formats=["tensorboard"])
    if not logger.has_tb:
        import pytest
        pytest.skip("tensorboard not available")
    rng = np.random.RandomState(0)
    fig = mel_comparison_figure(rng.randn(40, 16), rng.randn(40, 16), "t")
    logger.log_figure("synth/mel_comparison", fig, 10)
    logger.log_audio("synth/onestep_audio",
                     0.1 * np.sin(np.arange(2205) * 0.06), 22050, 10)
    logger.logkv("step", 10)
    logger.logkv("loss", 1.5)
    logger.dumpkvs()
    logger.close()

    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    tags = acc.Tags()
    assert "synth/mel_comparison" in tags.get("images", []), tags
    assert "synth/onestep_audio" in tags.get("audio", []), tags
    assert "loss" in tags.get("scalars", []), tags


def test_synthesize_step_viz_payload():
    """with_viz=True returns mel-frame f0/energy target+prediction tracks
    and (cwt mode) the cwt spectrogram pair for the reference-parity TB
    figures (synth_one_sample_diff, utils/tools.py:294-345)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.train.loop import make_synthesize_step
    from tests.helpers import tiny_batch, tiny_config

    cfg = tiny_config(pitch_type="cwt")
    model = CMTTS(cfg)
    b = tiny_batch(B=2)
    jb = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
              {kk: jnp.asarray(vv) for kk, vv in v.items()})
          for k, v in b.items() if v is not None}
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, jb["mels"], jnp.zeros(2),
        speakers=jb["speakers"], texts=jb["texts"], src_lens=jb["src_lens"],
        mel2ph=jb["mel2ph"], d_targets=jb["d_targets"],
        p_targets=jb["p_targets"], e_targets=jb["e_targets"],
        deterministic=True)

    synth = make_synthesize_step(model, cfg, with_viz=True)
    mel, mel_loss, viz = synth(variables["params"], jb, jax.random.PRNGKey(1))

    B, T_mel = jb["mels"].shape[:2]
    for key in ("f0_target", "f0_pred", "e_target", "e_pred"):
        assert key in viz, sorted(viz)
        assert viz[key].shape == (B, T_mel), (key, viz[key].shape)
        assert np.isfinite(np.asarray(viz[key])).all(), key
    assert viz["cwt_pred"].shape == (B, T_mel, 10)
    assert viz["cwt_target"].shape == (B, T_mel, 10)
    # teacher-forced f0 target track: voiced somewhere, zero where uv=1
    f0t = np.asarray(viz["f0_target"])
    uv = np.asarray(jb["p_targets"]["uv"])
    assert (f0t[uv > 0.5] == 0).all()
    assert (f0t[uv < 0.5] > 0).any()

    # the figure helpers accept the tracks
    from cmtts_tpu.utils_plot import contour_comparison_figure

    fig = contour_comparison_figure(f0t[0], np.asarray(viz["f0_pred"][0]),
                                    "f0", "Hz")
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)

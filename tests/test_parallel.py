"""Data-parallel semantics on the virtual 8-device CPU mesh (replaces
the reference's Gloo-on-one-box testing pattern, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.models.cmtts import CMTTS
from cmtts_tpu.parallel.sharding import (
    data_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicate_state,
    shard_batch,
)
from cmtts_tpu.train.loop import make_train_step
from cmtts_tpu.train.resample import create_schedule_sampler
from cmtts_tpu.train.state import create_train_state, make_optimizer

from helpers import tiny_batch, tiny_config


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_and_pad():
    mesh = make_mesh()
    batch = {"a": np.ones((8, 4), np.float32), "ids": ["x"] * 8}
    sharded = shard_batch(batch, mesh)
    assert sharded["a"].sharding.spec == data_sharding(mesh).spec
    assert sharded["ids"] == ["x"] * 8

    batch2, orig = pad_batch_to_multiple({"a": np.ones((6, 4), np.float32)}, 8)
    assert orig == 6
    assert batch2["a"].shape == (8, 4)


def test_gather_per_sample_branches():
    """Both gather paths (device_get and process_allgather) must return
    the full global value of a mesh-sharded array in original order."""
    from cmtts_tpu.parallel.sharding import gather_per_sample

    mesh = make_mesh()
    losses = np.arange(8, dtype=np.float32) + 1.0
    sharded = jax.device_put(losses, data_sharding(mesh))
    np.testing.assert_array_equal(gather_per_sample(sharded), losses)
    np.testing.assert_array_equal(
        gather_per_sample(sharded, force_allgather=True), losses)


def test_lsm_update_from_sharded_outputs():
    """The LSM sampler must see the GLOBAL per-sample losses under DP
    (reference syncs with all_gather, resample.py:117-153).  Drive the
    REAL train step on the 8-device mesh with a sharded batch, route its
    per-sample outputs through gather_per_sample (both branches), and
    assert the LSM history equals the single-device run's."""
    from cmtts_tpu.parallel.sharding import gather_per_sample
    from cmtts_tpu.train.resample import LossSecondMomentSampler

    cfg = tiny_config()
    model = CMTTS(cfg)
    batch_np = tiny_batch(B=2)

    def rep(x):
        return np.concatenate([x] * 4, axis=0)

    big = {}
    for k, v in batch_np.items():
        if k == "p_targets":
            big[k] = {kk: jnp.asarray(rep(vv)) for kk, vv in v.items()}
        elif isinstance(v, np.ndarray):
            big[k] = jnp.asarray(rep(v))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        big["mels"], jnp.zeros(8),
        speakers=big["speakers"], texts=big["texts"], src_lens=big["src_lens"],
        mel2ph=big["mel2ph"], d_targets=big["d_targets"],
        p_targets=big["p_targets"], e_targets=big["e_targets"],
        deterministic=True)
    tx = make_optimizer(1e-3)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    step_rng = jax.random.PRNGKey(5)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)

    # single-device run -> LSM history
    state1 = create_train_state(variables["params"], tx, n_ema=1)
    _, m1 = step(state1, big, probs, step_rng, jnp.asarray(0.9))
    s_local = LossSecondMomentSampler(3, history_per_term=4)
    s_local.update(np.asarray(m1["indices"]),
                   np.asarray(m1["loss_per_sample"]))

    # sharded run -> gather -> LSM history
    mesh = make_mesh()
    state2 = create_train_state(variables["params"], tx, n_ema=1)
    state2 = replicate_state(state2, mesh)
    sharded = shard_batch(big, mesh)
    _, m2 = step(state2, sharded, probs, step_rng, jnp.asarray(0.9))
    for force in (False, True):
        s_shard = LossSecondMomentSampler(3, history_per_term=4)
        s_shard.update(
            gather_per_sample(m2["indices"], force_allgather=force),
            gather_per_sample(m2["loss_per_sample"], force_allgather=force))
        np.testing.assert_array_equal(s_local._counts, s_shard._counts)
        np.testing.assert_allclose(s_local._history, s_shard._history,
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    """The sharded train step must produce the same loss/params as the
    unsharded one (XLA inserts the grad all-reduce)."""
    cfg = tiny_config()
    model = CMTTS(cfg)
    batch_np = tiny_batch(B=2)

    # replicate batch to 8 samples so it shards evenly
    def rep(x):
        return np.concatenate([x] * 4, axis=0)

    big = {}
    for k, v in batch_np.items():
        if k == "p_targets":
            big[k] = {kk: jnp.asarray(rep(vv)) for kk, vv in v.items()}
        elif isinstance(v, np.ndarray):
            big[k] = jnp.asarray(rep(v))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        big["mels"], jnp.zeros(8),
        speakers=big["speakers"], texts=big["texts"], src_lens=big["src_lens"],
        mel2ph=big["mel2ph"], d_targets=big["d_targets"],
        p_targets=big["p_targets"], e_targets=big["e_targets"],
        deterministic=True)
    tx = make_optimizer(1e-3)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    step_rng = jax.random.PRNGKey(5)

    # single-device run
    state1 = create_train_state(variables["params"], tx, n_ema=1)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    s1, m1 = step(state1, big, probs, step_rng, jnp.asarray(0.9))

    # sharded run
    mesh = make_mesh()
    state2 = create_train_state(variables["params"], tx, n_ema=1)
    state2 = replicate_state(state2, mesh)
    sharded = shard_batch(big, mesh)
    s2, m2 = step(state2, sharded, probs, step_rng, jnp.asarray(0.9))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    p1 = np.asarray(s1.params["denoiser"]["out_proj"]["kernel"])
    p2 = np.asarray(s2.params["denoiser"]["out_proj"]["kernel"])
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-7)


def test_sharded_inference_matches_single_device():
    """Batch-sharded synthesis over the mesh == unsharded synthesis."""
    from cmtts_tpu.pipeline import Synthesizer

    cfg = tiny_config()
    model = CMTTS(cfg)
    rng = jax.random.PRNGKey(0)
    B, T_txt = 8, 8
    texts = np.tile(np.arange(1, T_txt + 1, dtype=np.int32), (B, 1))
    variables = model.init(
        {"params": rng, "dropout": rng},
        speakers=jnp.zeros(B, jnp.int32), texts=jnp.asarray(texts),
        src_lens=jnp.full((B,), T_txt, jnp.int32), t_mel=32,
        deterministic=True, method=CMTTS.condition)
    # reach the denoiser params too
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((B, 32, cfg.stft.n_mel_channels)), jnp.zeros(B),
        speakers=jnp.zeros(B, jnp.int32), texts=jnp.asarray(texts),
        src_lens=jnp.full((B,), T_txt, jnp.int32), deterministic=True)
    params = variables["params"]
    toks = [texts[i] for i in range(B)]

    plain = Synthesizer(cfg, params, None, T=1, text_buckets=(8,),
                        mel_buckets=(32,), compute_dtype=jnp.float32)
    mel1, lens1, _ = plain(toks, mel_bucket=32)

    mesh = make_mesh()
    sharded = Synthesizer(cfg, params, None, T=1, text_buckets=(8,),
                          mel_buckets=(32,), compute_dtype=jnp.float32,
                          mesh=mesh)
    mel2, lens2, _ = sharded(toks, mel_bucket=32)
    np.testing.assert_array_equal(lens1, lens2)
    np.testing.assert_allclose(mel1, mel2, rtol=1e-5, atol=1e-6)


def test_tp_inference_matches_single_device():
    """Synthesizer on a (1 data x 8 model) mesh — denoiser Megatron-
    sharded, everything else replicated — == unsharded synthesis.
    This is the latency-bound single-sample path where batch sharding
    cannot help."""
    from cmtts_tpu.parallel.sharding import make_mesh_2d
    from cmtts_tpu.pipeline import Synthesizer

    cfg = tiny_config()
    model = CMTTS(cfg)
    rng = jax.random.PRNGKey(0)
    B, T_txt = 2, 8
    texts = np.tile(np.arange(1, T_txt + 1, dtype=np.int32), (B, 1))
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((B, 32, cfg.stft.n_mel_channels)), jnp.zeros(B),
        speakers=jnp.zeros(B, jnp.int32), texts=jnp.asarray(texts),
        src_lens=jnp.full((B,), T_txt, jnp.int32), deterministic=True)
    params = variables["params"]
    toks = [texts[i] for i in range(B)]

    plain = Synthesizer(cfg, params, None, T=1, text_buckets=(8,),
                        mel_buckets=(32,), compute_dtype=jnp.float32)
    mel1, lens1, _ = plain(toks, mel_bucket=32)

    tp = Synthesizer(cfg, params, None, T=1, text_buckets=(8,),
                     mel_buckets=(32,), compute_dtype=jnp.float32,
                     mesh=make_mesh_2d(1, 8))
    k = tp.cm_params["denoiser"]["blocks"]["conv_filt"]["kernel"]
    assert "model" in str(k.sharding.spec)
    mel2, lens2, _ = tp(toks, mel_bucket=32)
    np.testing.assert_array_equal(lens1, lens2)
    np.testing.assert_allclose(mel1, mel2, rtol=1e-5, atol=1e-5)


def test_sharded_inference_with_vocoder_matches_single_device():
    """Full text->mel->WAV synthesis on the 8-device mesh == unsharded.
    On a >1-device mesh the vocoder must take the pure-XLA path (Pallas
    custom calls have no GSPMD partitioning rule); single-device keeps
    the fused kernels — outputs must agree either way."""
    from cmtts_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from cmtts_tpu.pipeline import Synthesizer

    cfg = tiny_config()
    model = CMTTS(cfg)
    rng = jax.random.PRNGKey(0)
    B, T_txt = 8, 8
    texts = np.tile(np.arange(1, T_txt + 1, dtype=np.int32), (B, 1))
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((B, 32, cfg.stft.n_mel_channels)), jnp.zeros(B),
        speakers=jnp.zeros(B, jnp.int32), texts=jnp.asarray(texts),
        src_lens=jnp.full((B,), T_txt, jnp.int32), deterministic=True)
    tiny_voc = HiFiGANConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        num_mels=cfg.stft.n_mel_channels)
    voc = HiFiGANGenerator(tiny_voc)
    voc_params = voc.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8, cfg.stft.n_mel_channels)))["params"]
    toks = [texts[i] for i in range(B)]

    plain = Synthesizer(cfg, variables["params"], voc_params, T=1,
                        text_buckets=(8,), mel_buckets=(32,),
                        compute_dtype=jnp.float32)
    plain.hifigan = voc
    mel1, lens1, wav1 = plain(toks, mel_bucket=32)

    sharded = Synthesizer(cfg, variables["params"], voc_params, T=1,
                          text_buckets=(8,), mel_buckets=(32,),
                          compute_dtype=jnp.float32, mesh=make_mesh())
    sharded.hifigan = voc
    mel2, lens2, wav2 = sharded(toks, mel_bucket=32)
    np.testing.assert_array_equal(lens1, lens2)
    np.testing.assert_allclose(mel1, mel2, rtol=1e-5, atol=1e-6)
    # wav tolerance is bf16-bound: the single-device vocoder runs the
    # Pallas kernels (in-kernel bf16 activations), the mesh path pure
    # f32 XLA
    np.testing.assert_allclose(wav1, wav2, rtol=2e-2, atol=1e-4)


def test_padded_duplicates_contribute_zero_loss():
    """pad_batch_to_multiple adds sample_valid; the train step must be
    EXACTLY invariant to the padded rows' contents (VERDICT r2 weak #5 —
    previously duplicates slightly re-weighted the gradient)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmtts_tpu.parallel.sharding import pad_batch_to_multiple
    from cmtts_tpu.train.loop import make_train_step
    from cmtts_tpu.train.state import create_train_state, make_optimizer
    from cmtts_tpu.train.resample import create_schedule_sampler
    from tests.helpers import tiny_config, tiny_batch
    from cmtts_tpu.models.cmtts import CMTTS

    cfg = tiny_config()
    model = CMTTS(cfg)
    b2 = tiny_batch(B=2)
    b2 = {k: v for k, v in b2.items() if v is not None}
    padded, orig = pad_batch_to_multiple(dict(b2), 3)
    assert orig == 2 and padded["mels"].shape[0] == 3
    assert padded["sample_valid"].tolist() == [1, 1, 0]

    # second copy with garbage in the padded row
    garbage = {k: (v.copy() if isinstance(v, np.ndarray) else
                   {kk: vv.copy() for kk, vv in v.items()})
               for k, v in padded.items()}
    for k, v in garbage.items():
        if k == "sample_valid":
            continue
        if isinstance(v, np.ndarray) and v.ndim > 0 and v.shape[0] == 3:
            if np.issubdtype(v.dtype, np.floating):
                v[2] = 17.3
        elif isinstance(v, dict):
            for vv in v.values():
                if np.issubdtype(vv.dtype, np.floating):
                    vv[2] = 9.1

    def to_j(b):
        return {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                    {kk: jnp.asarray(vv) for kk, vv in v.items()})
                for k, v in b.items()}

    jb = to_j(padded)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, jb["mels"], jnp.zeros(3),
        speakers=jb["speakers"], texts=jb["texts"], src_lens=jb["src_lens"],
        mel2ph=jb["mel2ph"], d_targets=jb["d_targets"],
        p_targets=jb["p_targets"], e_targets=jb["e_targets"],
        deterministic=True)
    tx = make_optimizer(1e-4)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    key = jax.random.PRNGKey(5)

    s0 = create_train_state(variables["params"], tx, n_ema=1)
    sA, mA = step(s0, jb, probs, key, jnp.asarray(0.95))
    sB, mB = step(s0, to_j(garbage), probs, key, jnp.asarray(0.95))

    np.testing.assert_allclose(float(mA["loss"]), float(mB["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_padded_duplicates_exact_under_microbatch():
    """The sample_valid renormalization of the cm weights must be
    GLOBAL, not per-microbatch: with pod padding + gradient accumulation
    the cm gradient must equal the k=1 step's on the same padded batch
    even when the padded rows land unevenly across microbatches (B=3
    padded to 4, k=2: one microbatch gets 2 valid rows, the other 1).
    Variance lambdas and dropout are zeroed so the loss is the pure cm
    term — the variance masked means renormalize per microbatch by
    documented design (see tests/test_train.py::_batch4)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmtts_tpu.parallel.sharding import pad_batch_to_multiple
    from cmtts_tpu.train.loop import make_train_step
    from cmtts_tpu.train.state import create_train_state, make_optimizer
    from cmtts_tpu.train.resample import create_schedule_sampler
    from tests.helpers import tiny_config
    from cmtts_tpu.models.cmtts import CMTTS

    cfg = tiny_config()
    mc = cfg.model
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            mc,
            transformer=dataclasses.replace(
                mc.transformer, encoder_dropout=0.0, decoder_dropout=0.0),
            denoiser=dataclasses.replace(mc.denoiser, denoiser_dropout=0.0),
            variance_predictor=dataclasses.replace(
                mc.variance_predictor, dropout=0.0),
            variance_embedding=dataclasses.replace(
                mc.variance_embedding, use_energy_embed=False)),
        train=dataclasses.replace(
            cfg.train,
            loss=dataclasses.replace(
                cfg.train.loss, lambda_f0=0.0, lambda_uv=0.0,
                lambda_ph_dur=0.0, lambda_word_dur=0.0,
                lambda_sent_dur=0.0)))
    model = CMTTS(cfg)

    # uniform-length B=3 batch (numpy, for pad_batch_to_multiple)
    B, T_txt, T_mel, n_mels = 3, 8, 24, 16
    rs = np.random.RandomState(7)
    texts = rs.randint(1, 300, (B, T_txt)).astype(np.int32)
    d = np.full((B, T_txt), T_mel // T_txt, np.int32)
    d[:, -1] += T_mel - d.sum(1)[0]
    mel2ph = np.zeros((B, T_mel), np.int32)
    for b in range(B):
        pos = 0
        for i in range(T_txt):
            mel2ph[b, pos:pos + d[b, i]] = i + 1
            pos += d[b, i]
    b3 = {
        "speakers": np.zeros(B, np.int32),
        "texts": texts,
        "src_lens": np.full(B, T_txt, np.int32),
        "mels": rs.randn(B, T_mel, n_mels).astype(np.float32),
        "mel_lens": np.full(B, T_mel, np.int32),
        "mel2ph": mel2ph,
        "d_targets": d,
        "e_targets": rs.rand(B, T_txt).astype(np.float32),
        "p_targets": {
            "pitch": rs.randint(1, 255, (B, T_mel)).astype(np.int32),
            "f0": rs.rand(B, T_mel).astype(np.float32) * 2,
            "uv": (rs.rand(B, T_mel) > 0.7).astype(np.float32),
            "cwt_spec": rs.randn(B, T_mel, 10).astype(np.float32),
            "f0_mean": (5 + rs.rand(B)).astype(np.float32),
            "f0_std": (0.5 + rs.rand(B)).astype(np.float32),
        },
    }
    padded, orig = pad_batch_to_multiple(dict(b3), 4)
    assert orig == 3 and padded["sample_valid"].tolist() == [1, 1, 1, 0]

    jb = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
              {kk: jnp.asarray(vv) for kk, vv in v.items()})
          for k, v in padded.items()}
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, jb["mels"], jnp.zeros(4),
        speakers=jb["speakers"], texts=jb["texts"], src_lens=jb["src_lens"],
        mel2ph=jb["mel2ph"], d_targets=jb["d_targets"],
        p_targets=jb["p_targets"], e_targets=jb["e_targets"],
        deterministic=True)
    tx = make_optimizer(1e-4)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    key = jax.random.PRNGKey(5)

    step1 = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                            microbatch=0)
    step2 = make_train_step(model, cfg, tx, num_scales=3, donate=False,
                            microbatch=2)
    s0 = create_train_state(variables["params"], tx, n_ema=1)
    sA, mA = step1(s0, jb, probs, key, jnp.asarray(0.95))
    sB, mB = step2(s0, jb, probs, key, jnp.asarray(0.95))

    np.testing.assert_allclose(float(mA["loss"]), float(mB["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                    jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


# -- tensor parallelism (Megatron split of the denoiser blocks) ---------------
def test_denoiser_tp_forward_matches_replicated():
    """Column/row-sharding the WaveNet block weights over the 'model'
    axis is an execution-layout choice only: the TP forward must equal
    the replicated forward (GSPMD inserts the per-block psum)."""
    from cmtts_tpu.core.config import DenoiserConfig
    from cmtts_tpu.models.denoiser import Denoiser
    from cmtts_tpu.parallel.sharding import make_mesh_2d, tp_shard_tree

    cfg = DenoiserConfig(residual_layers=2, residual_channels=16)
    B, L, M = 2, 12, 80
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, L, M))
    t = jnp.asarray([0.5, 2.0])
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (B, L, 16))
    model = Denoiser(cfg)
    params = model.init(rng, x, t, cond)["params"]
    y1 = model.apply({"params": params}, x, t, cond)

    mesh = make_mesh_2d(1, 8)
    params_tp = tp_shard_tree(params, mesh)
    k = params_tp["blocks"]["conv_gate"]["kernel"]
    assert "model" in str(k.sharding.spec)
    y2 = jax.jit(lambda p: model.apply({"params": p}, x, t, cond))(params_tp)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dp_tp_train_step_matches_single_device():
    """Full CT train step on a 2x4 (data x model) mesh — batch sharded
    on 'data', denoiser blocks Megatron-sharded on 'model' — produces
    the same loss and updated params as the single-device step."""
    from cmtts_tpu.parallel.sharding import make_mesh_2d, tp_shard_tree

    cfg = tiny_config()
    model = CMTTS(cfg)
    batch_np = tiny_batch(B=2)

    def rep(x):
        return np.concatenate([x] * 4, axis=0)

    big = {}
    for k, v in batch_np.items():
        if k == "p_targets":
            big[k] = {kk: jnp.asarray(rep(vv)) for kk, vv in v.items()}
        elif isinstance(v, np.ndarray):
            big[k] = jnp.asarray(rep(v))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        big["mels"], jnp.zeros(8),
        speakers=big["speakers"], texts=big["texts"], src_lens=big["src_lens"],
        mel2ph=big["mel2ph"], d_targets=big["d_targets"],
        p_targets=big["p_targets"], e_targets=big["e_targets"],
        deterministic=True)
    tx = make_optimizer(1e-3)
    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    step_rng = jax.random.PRNGKey(5)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)

    state1 = create_train_state(variables["params"], tx, n_ema=1)
    s1, m1 = step(state1, big, probs, step_rng, jnp.asarray(0.9))

    mesh = make_mesh_2d(2, 4)
    state2 = create_train_state(variables["params"], tx, n_ema=1)
    state2 = tp_shard_tree(state2, mesh)
    sharded = shard_batch(big, mesh, axis="data")
    s2, m2 = step(state2, sharded, probs, step_rng, jnp.asarray(0.9))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for layer, leaf in (("conv_gate", "kernel"), ("out_proj", "kernel")):
        p1 = np.asarray(s1.params["denoiser"]["blocks"][layer][leaf])
        p2 = np.asarray(s2.params["denoiser"]["blocks"][layer][leaf])
        np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-6)

"""Worker process for the two-process distributed test.

Each worker calls ``jax.distributed.initialize`` (the TPU-native
equivalent of the reference's MPI rank bootstrap,
``model/cm_tool/dist_util.py:22-43``) on the CPU platform with 2 local
devices, forming a 2-process x 2-device = 4-device global mesh, then:

1. checks process/device topology;
2. exercises the ``process_allgather`` branch of
   ``parallel.sharding.gather_per_sample`` on a genuinely
   cross-process-sharded array (the reference's LSM all_gather,
   ``resample.py:117-153``, ran as real separate ranks — this is the
   first time our equivalent does too);
3. runs ONE real DP consistency-training step on a globally sharded
   batch with a replicated train state, feeds the gathered per-sample
   outputs to the LSM sampler, and dumps loss / updated-param checksum /
   LSM history to JSON for the parent test to cross-check against a
   single-process run.

Launched by ``tests/test_multiprocess.py`` — not a pytest module itself.
"""

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    # Must run before any backend use (same contract as the reference's
    # setup_dist before model construction).
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers import tiny_batch, tiny_config

    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.parallel.sharding import (
        data_sharding,
        gather_per_sample,
        make_mesh,
        replicate_state,
    )
    from cmtts_tpu.train.loop import make_train_step
    from cmtts_tpu.train.resample import (
        LossSecondMomentSampler,
        create_schedule_sampler,
    )
    from cmtts_tpu.train.state import create_train_state, make_optimizer

    assert jax.process_count() == args.num_processes, jax.process_count()
    assert len(jax.local_devices()) == 2, jax.local_devices()
    assert len(jax.devices()) == 2 * args.num_processes

    mesh = make_mesh()
    shard = data_sharding(mesh)

    # -- 1. cross-process gather of a sharded per-sample array ---------
    B = 2 * args.num_processes
    global_vals = (np.arange(B, dtype=np.float32) + 1.0) * 3.0
    lo = 2 * args.process_id
    local_rows = global_vals[lo:lo + 2]
    x = jax.make_array_from_process_local_data(shard, local_rows, (B,))
    assert not x.is_fully_addressable  # genuinely cross-process
    gathered = gather_per_sample(x)
    np.testing.assert_array_equal(gathered, global_vals)

    # -- 2. one DP train step on the global mesh -----------------------
    cfg = tiny_config()
    model = CMTTS(cfg)
    batch_np = tiny_batch(B=2)

    def rep(v):
        return np.concatenate([v] * (B // 2), axis=0)

    big = {}
    for k, v in batch_np.items():
        if k == "p_targets":
            big[k] = {kk: rep(vv) for kk, vv in v.items()}
        elif isinstance(v, np.ndarray):
            big[k] = rep(v)

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(big["mels"]), jnp.zeros(B),
        speakers=jnp.asarray(big["speakers"]), texts=jnp.asarray(big["texts"]),
        src_lens=jnp.asarray(big["src_lens"]), mel2ph=jnp.asarray(big["mel2ph"]),
        d_targets=jnp.asarray(big["d_targets"]),
        p_targets={k: jnp.asarray(v) for k, v in big["p_targets"].items()},
        e_targets=jnp.asarray(big["e_targets"]), deterministic=True)

    tx = make_optimizer(1e-3)
    state = create_train_state(variables["params"], tx, n_ema=1)
    state = replicate_state(state, mesh)

    def to_global(v):
        return jax.make_array_from_process_local_data(
            shard, np.ascontiguousarray(v[lo:lo + 2]), v.shape)

    gbatch = {}
    for k, v in big.items():
        if k == "p_targets":
            gbatch[k] = {kk: to_global(vv) for kk, vv in v.items()}
        else:
            gbatch[k] = to_global(v)

    probs = jnp.asarray(create_schedule_sampler("uniform", 3).probs())
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    new_state, metrics = step(state, gbatch, probs, jax.random.PRNGKey(5),
                              jnp.asarray(0.9))

    # loss is replicated -> addressable on every process
    loss = float(jax.device_get(metrics["loss"]))

    # per-sample outputs are cross-process sharded -> must route through
    # the process_allgather branch to feed the (host-side) LSM sampler
    indices = gather_per_sample(metrics["indices"])
    per_sample = gather_per_sample(metrics["loss_per_sample"])
    lsm = LossSecondMomentSampler(3, history_per_term=4)
    lsm.update(indices, per_sample)

    kernel = np.asarray(
        jax.device_get(new_state.params["denoiser"]["out_proj"]["kernel"]))

    with open(args.out, "w") as f:
        json.dump({
            "process_id": args.process_id,
            "process_count": jax.process_count(),
            "global_devices": len(jax.devices()),
            "loss": loss,
            "kernel_sum": float(kernel.sum()),
            "kernel_absmax": float(np.abs(kernel).max()),
            "indices": indices.tolist(),
            "loss_per_sample": per_sample.tolist(),
            "lsm_counts": lsm._counts.tolist(),
            "lsm_history": lsm._history.tolist(),
        }, f)
    print("mp_worker ok", args.process_id, flush=True)


if __name__ == "__main__":
    main()

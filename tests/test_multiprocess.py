"""Two REAL processes under ``jax.distributed.initialize`` (CPU).

The reference's data-parallel path ran as separate MPI ranks with Gloo
collectives (``model/cm_tool/dist_util.py:22-43``); every DP test so far
exercised our equivalent only under single-process 8-device jit.  This
test spawns two actual Python processes, each with 2 virtual CPU
devices, and checks:

- topology (2 processes x 2 local devices = 4 global);
- ``gather_per_sample``'s ``process_allgather`` branch on a
  cross-process-sharded array (the LSM sync path,
  reference ``resample.py:117-153``);
- a full DP consistency-training step on the 2-process mesh produces
  the SAME loss / updated params / LSM history as the single-process
  run of the identical batch (grad all-reduce spans processes).

Worker logic lives in ``tests/mp_worker.py``.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(TESTS_DIR)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # pin to CPU with 2 local devices; never touch the shared TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    env = _worker_env()
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "mp_worker.py"),
             "--process_id", str(i), "--num_processes", "2",
             "--port", str(port), "--out", str(outs[i])],
            env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    r0, r1 = results
    assert r0["process_count"] == 2 and r0["global_devices"] == 4

    # both processes must observe identical global results
    assert r0["loss"] == r1["loss"]
    assert r0["kernel_sum"] == r1["kernel_sum"]
    assert r0["indices"] == r1["indices"]
    np.testing.assert_array_equal(r0["lsm_counts"], r1["lsm_counts"])
    np.testing.assert_allclose(r0["lsm_history"], r1["lsm_history"],
                               rtol=1e-6)

    # -- single-process reference of the same step ---------------------
    from helpers import tiny_batch, tiny_config

    from cmtts_tpu.models.cmtts import CMTTS
    from cmtts_tpu.train.loop import make_train_step
    from cmtts_tpu.train.resample import (
        LossSecondMomentSampler,
        create_schedule_sampler,
    )
    from cmtts_tpu.train.state import create_train_state, make_optimizer

    cfg = tiny_config()
    model = CMTTS(cfg)
    batch_np = tiny_batch(B=2)

    def rep(v):
        return np.concatenate([v] * 2, axis=0)

    big = {}
    for k, v in batch_np.items():
        if k == "p_targets":
            big[k] = {kk: jnp.asarray(rep(vv)) for kk, vv in v.items()}
        elif isinstance(v, np.ndarray):
            big[k] = jnp.asarray(rep(v))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        big["mels"], jnp.zeros(4),
        speakers=big["speakers"], texts=big["texts"],
        src_lens=big["src_lens"], mel2ph=big["mel2ph"],
        d_targets=big["d_targets"], p_targets=big["p_targets"],
        e_targets=big["e_targets"], deterministic=True)
    tx = make_optimizer(1e-3)
    state = create_train_state(variables["params"], tx, n_ema=1)
    step = make_train_step(model, cfg, tx, num_scales=3, donate=False)
    new_state, metrics = step(state, big,
                              jnp.asarray(create_schedule_sampler(
                                  "uniform", 3).probs()),
                              jax.random.PRNGKey(5), jnp.asarray(0.9))

    np.testing.assert_allclose(r0["loss"], float(metrics["loss"]),
                               rtol=1e-5)
    kernel = np.asarray(new_state.params["denoiser"]["out_proj"]["kernel"])
    np.testing.assert_allclose(r0["kernel_sum"], float(kernel.sum()),
                               rtol=1e-5)

    lsm = LossSecondMomentSampler(3, history_per_term=4)
    lsm.update(np.asarray(metrics["indices"]),
               np.asarray(metrics["loss_per_sample"]))
    np.testing.assert_array_equal(r0["lsm_counts"], lsm._counts)
    np.testing.assert_allclose(r0["lsm_history"], lsm._history,
                               rtol=1e-5, atol=1e-7)

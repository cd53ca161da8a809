"""Orbax checkpointing with the reference's file-role structure.

The reference writes per-step torch files: ``model{step:06d}.pt``,
``ema_{rate}_{step:06d}.pt`` (x3), ``target_model{step:06d}.pt``,
``opt{step:06d}.pt`` (``train_util.py:881-927``).  Here one Orbax step
directory holds the same roles as named sub-trees; saves are rank-0-free
(Orbax handles the single-writer/multihost coordination the reference
did with dist.barrier + MPI broadcast).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from cmtts_tpu.train.state import CMTrainState


def _ckpt_dir(base: str) -> str:
    return os.path.join(os.path.abspath(base), "CMDenoiserTTS")


_ASYNC_CKPTR: ocp.AsyncCheckpointer | None = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until every pending async save has committed (call before
    process exit / before reading a just-written step dir)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(base_path: str, state: CMTrainState,
                    sampler_state: dict | None = None,
                    blocking: bool = True) -> str:
    """Write one step directory containing all parameter roles.

    ``blocking=False`` returns as soon as the device->host snapshot is
    taken; the directory write commits in a background thread (Orbax
    AsyncCheckpointer — the SURVEY §5 'async save' requirement; the
    reference instead blocks the loop in rank-0 torch.save +
    dist.barrier, train_util.py:881-927).  Single-writer ordering is
    preserved: a new save first waits for the previous one.
    """
    step = int(jax.device_get(state.step))
    path = os.path.join(_ckpt_dir(base_path), f"step_{step:08d}")
    payload = {
        "step": step,
        "model": jax.device_get(state.params),
        "opt": jax.device_get(state.opt_state),
        "target_model": jax.device_get(state.target_params),
    }
    for i, ema in enumerate(state.ema_params):
        payload[f"ema_{i}"] = jax.device_get(ema)
    if sampler_state:
        payload["sampler"] = {k: np.asarray(v) for k, v in sampler_state.items()}
    ckptr = _async_ckptr()
    ckptr.wait_until_finished()  # serialize with any in-flight save
    ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    if blocking:
        ckptr.wait_until_finished()
    return path


def write_run_config(base_path: str, run_config: dict) -> str:
    """Persist run-level flags that change the compute graph (ADVICE r4:
    a --cwt_masked_std-trained checkpoint synthesized without the flag
    silently reintroduces the ~350-cent train/infer standardization
    mismatch).  JSON sidecar next to the step dirs rather than inside
    the orbax payload (strings don't belong in a StandardSave tree, and
    the sidecar is greppable)."""
    import json

    d = _ckpt_dir(base_path)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "run_config.json")
    with open(path, "w") as f:
        json.dump(run_config, f, indent=1, sort_keys=True)
    return path


def read_run_config(base_path: str) -> dict:
    """Run-level flags recorded by train_cm (empty for checkpoints
    predating the sidecar)."""
    import json

    path = os.path.join(_ckpt_dir(base_path), "run_config.json")
    if os.path.isfile(path):
        with open(path) as f:
            return json.load(f)
    return {}


def list_checkpoint_steps(base_path: str) -> list[int]:
    d = _ckpt_dir(base_path)
    if not os.path.isdir(d):
        return []
    steps = []
    for name in os.listdir(d):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_complete_step(base_path: str) -> int:
    """Highest step whose checkpoint finished committing (0 if none).

    Completeness = Orbax's commit marker ``_CHECKPOINT_METADATA`` exists
    inside the step dir, so a run killed mid-async-save never resumes
    from a half-written directory.  Used by ``--restore_step -1``
    (auto-resume) in cli/train_cm.py.
    """
    best = 0
    for s in list_checkpoint_steps(base_path):
        p = os.path.join(_ckpt_dir(base_path), f"step_{s:08d}",
                         "_CHECKPOINT_METADATA")
        if os.path.exists(p):
            best = max(best, s)
    return best


def restore_checkpoint(base_path: str, step: int | None = None,
                       template: Any = None) -> dict:
    """Restore a step dir (latest if step is None).  ``template`` is an
    abstract payload matching save_checkpoint's structure; None restores
    as raw pytrees."""
    wait_for_saves()  # a same-process async save may still be in flight
    steps = list_checkpoint_steps(base_path)
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {_ckpt_dir(base_path)}")
    if step is None:
        step = steps[-1]
    elif step not in steps:
        raise FileNotFoundError(f"step {step} not in {steps}")
    path = os.path.join(_ckpt_dir(base_path), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


def restore_payload_from_dir(path: str) -> dict:
    """Restore one explicit step directory (teacher loading)."""
    wait_for_saves()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def _rebuild_like(template: Any, restored: Any) -> Any:
    """Rebuild ``template``'s pytree structure (NamedTuples and all) from
    an orbax-restored plain-container tree, matching NamedTuple fields BY
    NAME (orbax serializes them as dicts keyed by field name).  Immune to
    leaf-order / field-order drift across optax versions."""
    if restored is None:
        # orbax drops empty containers (optax EmptyState) to None; the
        # template's node is leafless, so keep it
        return template
    if hasattr(template, "_fields"):  # NamedTuple (optax states)
        if isinstance(restored, dict):
            vals = [_rebuild_like(getattr(template, f),
                                  restored[f] if f in restored
                                  else restored[str(i)])
                    for i, f in enumerate(template._fields)]
        else:
            vals = [_rebuild_like(getattr(template, f), r)
                    for f, r in zip(template._fields, restored)]
        return type(template)(*vals)
    if isinstance(template, dict):
        return {k: _rebuild_like(v, restored[k]) for k, v in template.items()}
    if isinstance(template, (tuple, list)):
        if isinstance(restored, dict):  # some orbax versions key by index
            restored = [restored[str(i)] for i in range(len(template))]
        return type(template)(_rebuild_like(t, r)
                              for t, r in zip(template, restored))
    return restored


def state_from_payload(payload: dict, tx, n_ema: int) -> CMTrainState:
    import jax.numpy as jnp

    from cmtts_tpu.train.state import CMTrainState

    # orbax restores optax NamedTuple states as plain dicts keyed by field
    # name; rebuild against a freshly initialized template by field NAME
    # (not leaf order, which is brittle across optax versions)
    target = tx.init(payload["model"])
    opt_state = _rebuild_like(target, payload["opt"])

    return CMTrainState(
        step=jnp.asarray(payload["step"], jnp.int32),
        params=payload["model"],
        opt_state=opt_state,
        ema_params=tuple(payload[f"ema_{i}"] for i in range(n_ema)),
        target_params=payload["target_model"],
    )

"""Data-parallel sharding over a JAX device mesh.

TPU-native replacement for the reference's MPI + NCCL DDP substrate
(``model/cm_tool/dist_util.py``, ``train_util.py:100-117``):

- 1-D mesh over the 'data' axis (ICI);
- batch arrays sharded on axis 0, train state replicated;
- the gradient all-reduce is inserted by XLA when the jitted train step
  consumes sharded batches and produces replicated grads — no DDP hooks,
  no ``no_sync`` microbatch dance, no rank-0 param broadcast
  (replicated-by-construction);
- for multi-host pods, call :func:`initialize_distributed` first
  (``jax.distributed.initialize`` over DCN).

The model here is ~27M params with batch 32: pure DP saturates the chips
— matching the reference's single parallelism strategy (SURVEY §2.8) —
while the same helpers accept wider meshes for larger model variants
(the batch axis simply spans all devices).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host bootstrap (replaces MPI rank setup, dist_util.py:22-43)."""
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data",
                leading_axes: int = 0) -> Any:
    """Device-put a host batch pytree with batch-axis sharding.  Non-array
    leaves (id/raw-text lists) pass through untouched.  ``leading_axes``
    shifts the sharded axis right (e.g. 1 for K-step stacked batches of
    shape (K, B, ...): the scan axis stays replicated, B is sharded)."""
    if leading_axes:
        sharding = NamedSharding(mesh, P(*([None] * leading_axes + [axis])))
    else:
        sharding = data_sharding(mesh, axis)

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) > 0:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a train-state pytree across the mesh (the reference's
    sync_params broadcast becomes a no-op by construction)."""
    return jax.device_put(state, replicated(mesh))


def pad_batch_to_multiple(batch: dict, multiple: int) -> tuple[dict, int]:
    """Pad batch axis 0 up to a device-count multiple (repeating the last
    sample); returns (batch, original_size).

    A ``sample_valid`` mask (1 for real rows, 0 for duplicates) is added
    so the train step can zero the duplicates' loss contribution exactly
    (cm weights rescaled, variance masks zeroed — see
    ``cm/losses.variance_loss``); without it the duplicates would
    slightly re-weight the gradient.
    """
    sizes = [v.shape[0] for v in jax.tree_util.tree_leaves(batch)
             if isinstance(v, np.ndarray) and v.ndim > 0]
    B = sizes[0]
    rem = B % multiple
    if rem == 0:
        return batch, B
    pad_n = multiple - rem

    def pad(x):
        if isinstance(x, np.ndarray) and x.ndim > 0 and x.shape[0] == B:
            reps = np.repeat(x[-1:], pad_n, axis=0)
            return np.concatenate([x, reps], axis=0)
        return x

    out = jax.tree_util.tree_map(pad, batch)
    out["sample_valid"] = np.concatenate(
        [np.ones(B, np.float32), np.zeros(pad_n, np.float32)])
    return out, B


def gather_per_sample(x: Any, force_allgather: bool = False) -> np.ndarray:
    """Fetch a per-sample device array to host numpy across ALL processes.

    The LSM sampler's loss history must see every sample in the global
    batch (reference resample.py:117-153 all_gathers local losses across
    ranks).  Under multi-process JAX the per-sample train-step outputs
    ('indices', 'loss_per_sample') are globally sharded and NOT fully
    addressable from one host — ``np.asarray`` on them raises.  Route
    them through ``process_allgather``, which returns the full global
    value on every host; single-process arrays take the plain
    ``device_get`` path.

    ``force_allgather`` exists for single-controller tests of the
    multihost branch.
    """
    if force_allgather or jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


# -- tensor parallelism (denoiser Megatron split) -----------------------------
#
# The WaveNet denoiser carries ~all training FLOPs (20 gated residual
# blocks, C=256). Each block is the classic two-matmul sandwich:
# column-parallel up-projections (conv_gate / conv_filt — separate
# modules precisely so the gated product stays shard-local), then the
# row-parallel out_proj whose contraction GSPMD closes with one psum
# per block over the 'model' axis. Everything outside the blocks
# (conditioning net, variance adaptor, heads) is tiny and stays
# replicated. No hand-written collectives: params are committed to
# NamedShardings and XLA's SPMD partitioner inserts the all-gathers /
# reduce-scatters (scaling-book recipe; replaces nothing in the
# reference, which is DDP-only — train_util.py:100-117).

_TP_BLOCK_SPECS = {
    "conv_gate": {"kernel": P(None, None, None, "model"),
                  "bias": P(None, "model")},
    "conv_filt": {"kernel": P(None, None, None, "model"),
                  "bias": P(None, "model")},
    # row-parallel: contraction (input) axis sharded, output replicated
    # after the GSPMD-inserted psum; bias replicated (added post-psum)
    "out_proj": {"kernel": P(None, "model", None), "bias": P()},
}


def make_mesh_2d(n_data: int, n_model: int,
                 axes: tuple[str, str] = ("data", "model")) -> Mesh:
    """2-D (data x model) mesh. Lay 'model' along the mesh minor axis so
    per-block psums ride the fastest ICI links."""
    need = n_data * n_model
    devices = jax.devices()
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_model), axes)


def _tp_spec_for_path(path) -> P:
    names = [getattr(k, "key", None) for k in path]
    # matches .../denoiser/blocks/<layer>/<param> at any prefix depth —
    # the same leaf layout appears inside params, EMA/target copies and
    # the optimizer moments
    if len(names) >= 3 and names[-3] == "blocks":
        spec = _TP_BLOCK_SPECS.get(names[-2], {}).get(names[-1])
        if spec is not None:
            return spec
    return P()


def tp_shard_tree(tree: Any, mesh: Mesh) -> Any:
    """device_put a params-shaped pytree (params, EMA, target, optimizer
    moments, or a whole train state) with the denoiser TP layout;
    non-block leaves are replicated."""

    def put(path, x):
        if isinstance(x, (np.ndarray, jax.Array)):
            return jax.device_put(x, NamedSharding(mesh, _tp_spec_for_path(path)))
        return x

    return jax.tree_util.tree_map_with_path(put, tree)

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmtts_tpu.train.checkpoint import (
    list_checkpoint_steps,
    restore_checkpoint,
    save_checkpoint,
    state_from_payload,
)
from cmtts_tpu.train.state import CMTrainState, create_train_state, make_optimizer


def _tiny_state(step=7):
    params = {"layer": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                        "b": jnp.zeros(3)}}
    tx = make_optimizer(1e-4)
    state = create_train_state(params, tx, n_ema=3)
    return state.replace(step=jnp.asarray(step, jnp.int32)), tx


def test_checkpoint_roundtrip(tmp_path):
    state, tx = _tiny_state()
    sampler_state = {"history": np.ones((2, 10)), "counts": np.full(2, 10)}
    path = save_checkpoint(str(tmp_path), state, sampler_state)
    assert os.path.isdir(path)
    assert list_checkpoint_steps(str(tmp_path)) == [7]

    payload = restore_checkpoint(str(tmp_path))
    assert payload["step"] == 7
    np.testing.assert_allclose(
        payload["model"]["layer"]["w"],
        np.arange(6, dtype=np.float32).reshape(2, 3))
    np.testing.assert_allclose(payload["sampler"]["history"], 1.0)

    restored = state_from_payload(payload, tx, n_ema=3)
    assert int(restored.step) == 7
    assert len(restored.ema_params) == 3
    np.testing.assert_allclose(
        np.asarray(restored.target_params["layer"]["w"]),
        np.asarray(state.target_params["layer"]["w"]))


def test_checkpoint_multiple_steps(tmp_path):
    state, tx = _tiny_state(step=1)
    save_checkpoint(str(tmp_path), state)
    state2 = state.replace(step=jnp.asarray(5, jnp.int32))
    save_checkpoint(str(tmp_path), state2)
    assert list_checkpoint_steps(str(tmp_path)) == [1, 5]
    # latest by default
    assert restore_checkpoint(str(tmp_path))["step"] == 5
    # explicit step
    assert restore_checkpoint(str(tmp_path), 1)["step"] == 1
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path), 3)


def test_checkpoint_roundtrip_mesh_replicated(tmp_path):
    """Save a state whose arrays live replicated on the 8-device mesh
    (the production layout during training) and restore it — orbax must
    handle sharded jax.Arrays, and the payload must equal the host copy."""
    from cmtts_tpu.parallel.sharding import make_mesh, replicate_state

    state, tx = _tiny_state(step=3)
    mesh = make_mesh()
    state = replicate_state(state, mesh)
    path = save_checkpoint(str(tmp_path), state, None)
    assert os.path.isdir(path)

    payload = restore_checkpoint(str(tmp_path))
    np.testing.assert_allclose(
        payload["model"]["layer"]["w"],
        np.arange(6, dtype=np.float32).reshape(2, 3))
    restored = state_from_payload(payload, tx, n_ema=3)
    # restored state replicates back onto the mesh and keeps training
    restored = replicate_state(restored, mesh)
    assert int(restored.step) == 3


def test_rebuild_like_by_field_name():
    """Optimizer-state restore must match NamedTuple fields by NAME, not
    leaf order — optax field order can drift across versions (the
    restored orbax form is a dict keyed by field name)."""
    from cmtts_tpu.train.checkpoint import _rebuild_like

    state, tx = _tiny_state()
    target = tx.init(state.params)

    def to_plain(node):
        if hasattr(node, "_fields"):
            # reversed key order: an order-dependent rebuild would
            # scramble mu/nu/count
            return {f: to_plain(getattr(node, f))
                    for f in reversed(node._fields)}
        if isinstance(node, dict):
            return {k: to_plain(v) for k, v in node.items()}
        if isinstance(node, (tuple, list)):
            return [to_plain(v) for v in node]
        return np.asarray(node)

    # make leaves distinguishable so a mu/nu swap would be caught
    filled = jax.tree_util.tree_map(
        lambda x: jnp.full_like(jnp.asarray(x, jnp.float32),
                                float(np.asarray(x).size)), target)
    rebuilt = _rebuild_like(target, to_plain(filled))
    assert type(rebuilt) is type(target)
    flat_t = jax.tree_util.tree_leaves_with_path(filled)
    flat_r = jax.tree_util.tree_leaves_with_path(rebuilt)
    assert len(flat_t) == len(flat_r)
    for (pt, vt), (pr, vr) in zip(flat_t, flat_r):
        assert pt == pr
        np.testing.assert_allclose(np.asarray(vr), np.asarray(vt))


def test_rebuild_like_indexed_tuples():
    from cmtts_tpu.train.checkpoint import _rebuild_like

    template = ({"a": jnp.zeros(2)}, {"b": jnp.ones(3)})
    restored = {"0": {"a": np.full(2, 5.0)}, "1": {"b": np.full(3, 7.0)}}
    out = _rebuild_like(template, restored)
    assert isinstance(out, tuple)
    np.testing.assert_allclose(out[0]["a"], 5.0)
    np.testing.assert_allclose(out[1]["b"], 7.0)


def test_warn_if_bucket_saturated():
    from cmtts_tpu.pipeline import warn_if_bucket_saturated

    with pytest.warns(UserWarning, match="saturated the mel bucket"):
        assert warn_if_bucket_saturated(np.array([10, 32]), 32)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert not warn_if_bucket_saturated(np.array([10, 31]), 32)


def test_async_save_overlaps_and_roundtrips(tmp_path):
    """blocking=False returns before the write commits; wait_for_saves()
    (implicit in restore_checkpoint) makes the step dir readable with
    identical contents (VERDICT r2 missing #5 / SURVEY §5 async save)."""
    import numpy as np

    from cmtts_tpu.train.checkpoint import (restore_checkpoint,
                                            save_checkpoint, wait_for_saves)
    from cmtts_tpu.train.state import create_train_state, make_optimizer

    import jax.numpy as jnp

    params = {"w": jnp.arange(8.0), "b": jnp.ones((3,))}
    tx = make_optimizer(1e-4)
    state = create_train_state(params, tx, n_ema=3)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    path = save_checkpoint(str(tmp_path), state, {"h": np.ones(4)},
                           blocking=False)
    wait_for_saves()
    payload = restore_checkpoint(str(tmp_path), 7)
    np.testing.assert_array_equal(payload["model"]["w"], np.arange(8.0))
    assert payload["step"] == 7
    assert "sampler" in payload and payload["sampler"]["h"].shape == (4,)

    # a second async save serializes behind the first and still lands
    state2 = state.replace(step=jnp.asarray(9, jnp.int32))
    save_checkpoint(str(tmp_path), state2, blocking=False)
    payload2 = restore_checkpoint(str(tmp_path))  # waits internally
    assert payload2["step"] == 9

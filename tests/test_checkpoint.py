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

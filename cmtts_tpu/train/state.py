"""Train state: params + optimizer + EMA snapshots + target network.

The reference keeps master params, 3 EMA param lists, a target model and
an RAdam optimizer (``train_util.py:80-117, 592-932``); here the whole
bundle is one pytree so it shards/replicates/donates as a unit under jit.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class CMTrainState:
    step: jnp.ndarray                 # scalar int32
    params: Any
    opt_state: Any
    ema_params: tuple                 # one pytree per ema rate
    target_params: Any


def make_optimizer(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RAdam, matching the reference's optimizer choice
    (train_util.py:86-88; lr from train.yaml cm.lr)."""
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.radam(lr),
        )
    return optax.radam(lr)


def create_train_state(params, tx: optax.GradientTransformation,
                       n_ema: int) -> CMTrainState:
    """Initialize: target and EMA snapshots start as copies of params
    (reference utils/model.py:107-108: target <- model params).

    Copies must be REAL (fresh buffers, not aliases): the train step
    donates the whole state, and XLA rejects the same buffer donated
    twice (``f(donate(a), donate(a))``).
    """
    def copy_tree(t):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), t)

    return CMTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=tuple(copy_tree(params) for _ in range(n_ema)),
        target_params=copy_tree(params),
    )


def tree_ema(old, new, rate):
    """EMA update: old * rate + new * (1 - rate) (cm_tool/nn.py:57-69)."""
    return jax.tree_util.tree_map(
        lambda o, n: o * rate + n * (1.0 - rate), old, new)

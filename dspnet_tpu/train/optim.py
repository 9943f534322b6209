"""MXNet-convention SGD as an optax transformation.

The reference solver uses mx.optimizer.SGD with momentum 0.9, wd 5e-4 and
``rescale_grad = 1/batch_size`` (multi_solver.py:221-222, multi_train.py:56-61).
MXNet's update rule differs from optax.sgd in where weight decay and lr enter
the momentum buffer:

    mom   = momentum * mom - lr * (rescale * grad + wd * weight)
    weight = weight + mom

We reproduce it exactly so training dynamics are comparable.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class MXSGDState(NamedTuple):
    count: jnp.ndarray
    momentum: optax.Updates


def mxnet_sgd(
    learning_rate: Union[float, Callable],
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    rescale_grad: float = 1.0,
) -> optax.GradientTransformation:
    """Note on wd/lr multipliers: the reference's maintained custom-solver
    path creates the optimizer with NO param_idx2name and no symbol attrs
    (multi_solver.py:221-222), so MXNet's name-based wd_mult zeroing and the
    head builders' __lr_mult__/__wd_mult__ attrs never take effect there —
    uniform wd over every param, which is exactly what this implements. Only
    the legacy Module path (train/train_multitask.py) would apply them."""

    def init(params):
        return MXSGDState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        assert params is not None, "mxnet_sgd needs params for weight decay"
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        new_mom = jax.tree.map(
            lambda m, g, w: momentum * m - lr * (rescale_grad * g + weight_decay * w),
            state.momentum,
            grads,
            params,
        )
        # optax applies updates additively: new_w = w + update
        return new_mom, MXSGDState(count=state.count + 1, momentum=new_mom)

    return optax.GradientTransformation(init, update)

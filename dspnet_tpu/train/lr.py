"""Learning-rate schedules — reference multi_train.py:146-186 semantics."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def multifactor_schedule(base_lr: float, steps: Sequence[int], factor: float):
    """lr *= factor at each iteration in ``steps`` (MultiFactorScheduler)."""
    steps = tuple(int(s) for s in steps)

    def schedule(count):
        n = jnp.sum(jnp.asarray([count >= s for s in steps], jnp.int32)) if steps else 0
        return base_lr * (factor ** n)

    return schedule


def lr_scheduler_from_epochs(
    learning_rate: float,
    lr_refactor_step: str,
    lr_refactor_ratio: float,
    num_example: int,
    batch_size: int,
    begin_epoch: int = 0,
):
    """Exact port of multi_train.get_lr_scheduler: epoch-denominated refactor
    steps converted to iterations, with catch-up scaling when resuming.

    Returns (adjusted_base_lr, schedule_fn).
    """
    assert lr_refactor_ratio > 0
    iter_refactor = [int(r) for r in str(lr_refactor_step).split(",") if r.strip()]
    if lr_refactor_ratio >= 1:
        return learning_rate, multifactor_schedule(learning_rate, (), 1.0)
    lr = learning_rate
    # >= 1: an (effective) batch larger than the dataset otherwise floors
    # this to 0, collapsing every refactor boundary onto iteration 0 and
    # silently starting at the fully-decayed lr
    epoch_size = max(1, num_example // batch_size)
    for s in iter_refactor:
        if begin_epoch >= s:
            lr *= lr_refactor_ratio
    steps = [epoch_size * (x - begin_epoch) for x in iter_refactor if x > begin_epoch]
    return lr, multifactor_schedule(lr, steps, lr_refactor_ratio)

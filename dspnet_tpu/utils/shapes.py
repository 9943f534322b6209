"""Per-layer shape/summary dump.

Parity with the reference's golden shape tables and stat_helper monitor
(utils.py:35-37 internal_out_shapes_{320,512}; multi_solver.py:262-280): dump
every intermediate activation's shape (and optionally stats) for a model at
a given input resolution, without running real compute (eval_shape trace).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def intermediate_shapes(model, data_shape, batch: int = 1, train: bool = False) -> Dict[str, tuple]:
    """{module path: output shape} via an abstract trace."""
    H, W = data_shape
    x = jnp.zeros((batch, H, W, 3), jnp.float32)

    def init_and_run():
        variables = model.init(jax.random.PRNGKey(0), x, train=train)
        _, inter = model.apply(
            variables, x, train=train, capture_intermediates=True, mutable=["intermediates"]
        )
        return inter

    inter = jax.eval_shape(init_and_run)
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[name] = tuple(leaf.shape)
    return out


def print_summary(model, data_shape, batch: int = 1, train: bool = False, log_fn=print):
    shapes = intermediate_shapes(model, data_shape, batch, train)
    for name, shape in shapes.items():
        log_fn(f"{name:<70s} {shape}")
    return shapes

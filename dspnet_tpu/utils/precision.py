"""Mixed-precision helpers.

TPU MXU prefers bfloat16; the inference path casts params + activations to
bf16 and decodes boxes in float32 (box decode / NMS stay exact). Training
keeps float32 master weights (bf16 training lands with the loss-scale work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype``."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def bf16_variables(variables):
    return cast_floating(variables, jnp.bfloat16)

"""Dense layers operating on torch-layout weights.

Weights are stored exactly as in the published checkpoints — Linear weight
[out, in], Embedding table [vocab, dim] — so loading needs no transposes and
the arrays stay bit-identical to the safetensors payload. XLA folds the
contraction layout into the matmul at compile time.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def linear(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """y = x @ W^T + b with W in torch layout [out, in]."""
    y = lax.dot_general(
        x,
        weight,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
    )
    if bias is not None:
        y = y + bias
    return y


def embedding(tokens: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Lookup rows of table [vocab, dim] by integer tokens [...]."""
    return jnp.take(table, tokens, axis=0)

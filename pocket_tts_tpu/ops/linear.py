"""Dense layers operating on torch-layout weights.

Weights are stored exactly as in the published checkpoints — Linear weight
[out, in], Embedding table [vocab, dim] — so loading needs no transposes and
the arrays stay bit-identical to the safetensors payload. XLA folds the
contraction layout into the matmul at compile time.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def linear(x: jnp.ndarray, weight, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """y = x @ W^T + b with W in torch layout [out, in].

    Mixed precision: when the weight is lower precision (bf16 serving mode),
    the activation is cast down to match — the MXU multiplies in bf16 and
    accumulates in float32 — and the result is returned in the activation's
    original dtype.

    `weight` may also be an int8 weight-only quantized leaf
    {"q": int8 [out, in], "s": float32 [out]} (models/weights.quantize_int8).
    The per-output-channel scale commutes with the contraction
    (x @ (q * s[:, None]).T == (x @ q.T) * s), so it is applied to the f32
    accumulator AFTER the matmul: the kernel reads half the HBM bytes of bf16
    and loses no accumulation precision beyond the quantization itself.
    """
    out_dtype = x.dtype
    if isinstance(weight, dict):
        y = lax.dot_general(
            x.astype(jnp.bfloat16),
            weight["q"].astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = (y * weight["s"]).astype(out_dtype)
    else:
        if weight.dtype != x.dtype:
            x = x.astype(weight.dtype)
        y = lax.dot_general(
            x,
            weight,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
    if bias is not None:
        y = y + bias.astype(out_dtype)
    return y


def qkv_proj(x: jnp.ndarray, weight) -> jnp.ndarray:
    """Packed QKV projection with a head-shardable weight.

    weight is [3, E, E] (checkpoint rows reshaped at load: q rows, then k,
    then v — see models/weights.py). Keeping the three sections as a leading
    axis makes per-head tensor parallelism a plain PartitionSpec
    (None, 'tp', None): the output's F axis is head-major, so the reshape to
    [B, T, 3, H, d] splits a sharded axis without any collective. Returns
    [B, T, 3, F].

    Also accepts the int8 weight-only form {"q": int8 [3, F, E],
    "s": float32 [3, F]} (models/weights.quantize_int8).
    """
    out_dtype = x.dtype
    if isinstance(weight, dict):
        y = lax.dot_general(
            x.astype(jnp.bfloat16),
            weight["q"].astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y * weight["s"]).astype(out_dtype)
    if weight.dtype != x.dtype:
        x = x.astype(weight.dtype)
    return lax.dot_general(
        x,
        weight,
        dimension_numbers=(((x.ndim - 1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def embedding(tokens: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Lookup rows of table [vocab, dim] by integer tokens [...]."""
    return jnp.take(table, tokens, axis=0)

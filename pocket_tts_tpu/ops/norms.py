"""Normalization primitives.

The checkpoint was trained with two LayerNorm eps values and an unusual
RMSNorm variant, so these are parity-critical:
  - transformer LayerNorms use eps=1e-5 (reference:
    pocket_tts_mlx/modules/mimi_transformer.py:39-40, flow_lm.py:59)
  - flow-MLP LayerNorms use eps=1e-6 (reference: pocket_tts_mlx/modules/mlp.py:37)
  - flow-MLP RMSNorm computes *sample* variance (ddof=1) and adds eps to the
    variance before rsqrt (reference: pocket_tts_mlx/modules/mlp.py:16-21)

All statistics are computed in float32 regardless of activation dtype, then
cast back — on TPU the rsqrt/mul fuse into neighboring ops under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last axis: (x - mean) * rsqrt(var + eps) * w + b."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    y = centered * lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm_ddof1(x: jnp.ndarray, alpha: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm with ddof=1 variance: y = x * alpha * rsqrt(eps + var_1(x)).

    Note this is a true *variance* (mean-subtracted), not a mean-square, and
    uses the unbiased (N-1) divisor — an idiosyncrasy of the checkpoint.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    n = x.shape[-1]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / (n - 1)
    y = xf * (alpha.astype(jnp.float32) * lax.rsqrt(eps + var))
    return y.astype(dtype)

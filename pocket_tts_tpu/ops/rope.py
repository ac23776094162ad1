"""Rotary position embeddings (interleaved-pair convention).

Matches the reference numerics exactly: rotation computed in float32 on
even/odd interleaved pairs, with frequencies exp(-log(max_period) * 2i / D)
(reference: pocket_tts_mlx/modules/rope.py:9-42).

Positions are supplied explicitly per (batch, time) so the streaming decode
step can feed absolute stream offsets — including per-stream offsets in a
batched server — without host-side bookkeeping.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    positions: jnp.ndarray,
    max_period: float = 10_000.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q and k ([B, T, H, D]) by positions ([B, T] or [T] int/float)."""
    B, T, H, D = q.shape
    assert D % 2 == 0, "head dim must be even for RoPE"

    ds = jnp.arange(D // 2, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-math.log(max_period) * 2.0 / D))  # [D/2]

    ts = positions.astype(jnp.float32)
    if ts.ndim == 1:
        ts = jnp.broadcast_to(ts[None, :], (B, T))
    angles = ts[:, :, None] * freqs[None, None, :]  # [B, T, D/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, T, 1, D/2]
    sin = jnp.sin(angles)[:, :, None, :]

    def rotate(x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        xs = x.reshape(*x.shape[:-1], D // 2, 2)
        xr = xs[..., 0].astype(jnp.float32)
        xi = xs[..., 1].astype(jnp.float32)
        or_ = xr * cos - xi * sin
        oi = xr * sin + xi * cos
        out = jnp.stack([or_.astype(dtype), oi.astype(dtype)], axis=-1)
        return out.reshape(x.shape)

    return rotate(q), rotate(k)

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


def rope_angles(
    positions: jnp.ndarray, head_dim: int, max_period: float = 10_000.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute (cos, sin) [B, T, 1, D/2] for positions [B, T].

    Angles depend only on positions, so callers with multi-layer stacks
    compute them once per step and share across layers.
    """
    ds = jnp.arange(head_dim // 2, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-math.log(max_period) * 2.0 / head_dim))  # [D/2]
    angles = positions.astype(jnp.float32)[:, :, None] * freqs[None, None, :]
    return jnp.cos(angles)[:, :, None, :], jnp.sin(angles)[:, :, None, :]


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    positions: jnp.ndarray | None,
    max_period: float = 10_000.0,
    rope_cache: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q and k ([B, T, H, D]) by positions ([B, T] or [T] int/float),
    or by precomputed rope_cache = (cos, sin) from rope_angles()."""
    B, T, H, D = q.shape
    assert D % 2 == 0, "head dim must be even for RoPE"

    if rope_cache is not None:
        cos, sin = rope_cache
    else:
        ts = positions
        if ts.ndim == 1:
            ts = jnp.broadcast_to(ts[None, :], (B, T))
        cos, sin = rope_angles(ts, D, max_period)

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

"""Pallas TPU kernel: fused masked flash-decode attention (T=1 queries).

The FlowLM decode step issues, per layer, a chain of small XLA ops (mask
build, score matmul, select, softmax, weighted sum). This kernel fuses them
into one Mosaic program per (batch, head-block) grid cell, reading the KV
cache exactly once from HBM:

    out[b,h,:] = softmax_c( q[b,h,:] . K[b,h,c,:] / sqrt(d)  where
                            0 <= slot_pos[b,c] <= q_pos[b] ) . V[b,h,c,:]

The cache update (one contiguous dynamic_update_slice) stays outside in XLA,
which performs it in place under buffer donation.

Used by CausalKVAttention when POCKET_TTS_FLASH_DECODE=1 (see
attention.flash_decode_enabled); the pure-XLA path remains the default and
the correctness oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _kernel(qpos_ref, q_ref, k_ref, v_ref, sp_ref, o_ref, *, head_dim: int, h_blk: int):
    b = pl.program_id(0)
    qp = qpos_ref[b]

    # Build the [C, 1] mask from int32 (Mosaic only reshapes 32-bit types).
    sp = sp_ref[0][:, None]  # [C, 1] int32
    valid = (sp >= 0) & (sp <= qp)  # [C, 1] bool
    scale = 1.0 / math.sqrt(head_dim)

    # Mosaic has no batched dot; unroll the (small, static) head block and
    # keep every matmul strictly 2-D.
    for h in range(h_blk):
        q_h = q_ref[0, h, :].astype(jnp.float32)[:, None]  # [d, 1]
        k_h = k_ref[0, h, :, :].astype(jnp.float32)  # [C, d]
        v_h = v_ref[0, h, :, :].astype(jnp.float32)  # [C, d]

        scores = jnp.dot(k_h, q_h, preferred_element_type=jnp.float32) * scale  # [C, 1]
        scores = jnp.where(valid, scores, _NEG_INF)

        m = jnp.max(scores)
        e = jnp.exp(scores - m)  # [C, 1]
        w = e / jnp.sum(e)

        out = jnp.dot(w.T, v_h, preferred_element_type=jnp.float32)  # [1, d]
        o_ref[0, h, :] = out[0].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention(
    q: jnp.ndarray,  # [B, H, d] float32 (post-RoPE, T=1)
    k_cache: jnp.ndarray,  # [B, H, C, d] (cache dtype, already updated)
    v_cache: jnp.ndarray,  # [B, H, C, d]
    slot_pos: jnp.ndarray,  # [B, C] int32
    q_pos: jnp.ndarray,  # [B] int32 absolute query positions
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused masked decode attention -> [B, H, d] in q's dtype."""
    B, H, C, d = k_cache.shape

    # Head-block size: keep K+V VMEM blocks under ~4 MB.
    bytes_per_head = 2 * C * d * k_cache.dtype.itemsize
    h_blk = max(1, min(H, (4 * 1024 * 1024) // max(1, bytes_per_head)))
    while H % h_blk:
        h_blk -= 1

    grid = (B, H // h_blk)
    kernel = functools.partial(_kernel, head_dim=d, h_blk=h_blk)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, h_blk, d), lambda b, h, qp: (b, h, 0)),
                pl.BlockSpec((1, h_blk, C, d), lambda b, h, qp: (b, h, 0, 0)),
                pl.BlockSpec((1, h_blk, C, d), lambda b, h, qp: (b, h, 0, 0)),
                pl.BlockSpec((1, C), lambda b, h, qp: (b, 0)),
            ],
            out_specs=pl.BlockSpec((1, h_blk, d), lambda b, h, qp: (b, h, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, d), q.dtype),
        interpret=interpret,
    )(q_pos, q, k_cache, v_cache, slot_pos)

"""Pallas flash-decode kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.ops.attention import _sdpa
from pocket_tts_tpu.ops.flash_decode import flash_decode_attention

RNG = np.random.default_rng(51)


def _case(B, H, C, d, dtype=jnp.float32):
    q = jnp.array(RNG.standard_normal((B, H, d)).astype(np.float32))
    k = jnp.array(RNG.standard_normal((B, H, C, d)).astype(np.float32), dtype=dtype)
    v = jnp.array(RNG.standard_normal((B, H, C, d)).astype(np.float32), dtype=dtype)
    # mix of valid/invalid slots and per-stream positions
    slot_pos = RNG.integers(-1, 40, (B, C)).astype(np.int32)
    q_pos = RNG.integers(5, 40, (B,)).astype(np.int32)
    return q, k, v, jnp.array(slot_pos), jnp.array(q_pos)


def test_flash_decode_matches_sdpa():
    B, H, C, d = 2, 4, 128, 64
    q, k, v, slot_pos, q_pos = _case(B, H, C, d)
    ours = flash_decode_attention(q, k, v, slot_pos, q_pos, interpret=True)
    valid = (slot_pos[:, None, :] >= 0) & (slot_pos[:, None, :] <= q_pos[:, None, None])
    ref = _sdpa(q[:, :, None, :], k, v, valid[:, None])[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flash_decode_bf16_cache():
    B, H, C, d = 1, 8, 256, 64
    q, k, v, slot_pos, q_pos = _case(B, H, C, d, dtype=jnp.bfloat16)
    ours = flash_decode_attention(q, k, v, slot_pos, q_pos, interpret=True)
    valid = (slot_pos[:, None, :] >= 0) & (slot_pos[:, None, :] <= q_pos[:, None, None])
    ref = _sdpa(q[:, :, None, :], k, v, valid[:, None])[:, :, 0, :]
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_flash_decode_head_blocking():
    """H not divisible by the 4MB-budget block must still split evenly."""
    B, H, C, d = 1, 16, 512, 64
    q, k, v, slot_pos, q_pos = _case(B, H, C, d)
    ours = flash_decode_attention(q, k, v, slot_pos, q_pos, interpret=True)
    valid = (slot_pos[:, None, :] >= 0) & (slot_pos[:, None, :] <= q_pos[:, None, None])
    ref = _sdpa(q[:, :, None, :], k, v, valid[:, None])[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)

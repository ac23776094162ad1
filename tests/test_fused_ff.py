"""Fused FF Pallas kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pocket_tts_tpu.ops.fused_ff import fused_ff
from pocket_tts_tpu.ops.linear import linear
from pocket_tts_tpu.ops.norms import layer_norm

RNG = np.random.default_rng(81)


def _oracle(x, nw, nb, w1, w2, eps=1e-5):
    h = layer_norm(x, nw, nb, eps=eps)
    h = linear(h, w1)
    h = jax.nn.gelu(h, approximate=False)
    return x + linear(h, w2)


def _case(B, E, F, dtype=jnp.float32):
    x = jnp.array(RNG.standard_normal((B, E)).astype(np.float32))
    nw = jnp.array(RNG.standard_normal(E).astype(np.float32))
    nb = jnp.array(RNG.standard_normal(E).astype(np.float32))
    w1 = jnp.array((RNG.standard_normal((F, E)) * 0.05).astype(np.float32), dtype=dtype)
    w2 = jnp.array((RNG.standard_normal((E, F)) * 0.05).astype(np.float32), dtype=dtype)
    return x, nw, nb, w1, w2


def test_fused_ff_matches_oracle():
    x, nw, nb, w1, w2 = _case(2, 256, 512)
    ours = fused_ff(x, nw, nb, w1, w2, interpret=True)
    ref = _oracle(x, nw, nb, w1, w2)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_ff_bf16_weights():
    x, nw, nb, w1, w2 = _case(1, 256, 1024, dtype=jnp.bfloat16)
    ours = fused_ff(x, nw, nb, w1, w2, interpret=True)
    ref = _oracle(x, nw, nb, w1, w2)
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_fused_ff_multi_block_accumulation():
    """F larger than one block: output accumulates across grid steps."""
    x, nw, nb, w1, w2 = _case(4, 128, 2048)
    ours = fused_ff(x, nw, nb, w1, w2, interpret=True)
    ref = _oracle(x, nw, nb, w1, w2)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)

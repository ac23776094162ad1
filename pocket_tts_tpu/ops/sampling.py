"""Flow-matching sampling: noise draw + low-step ODE integration.

Matches the reference solver (reference: pocket_tts_mlx/models/flow_lm.py:18-28):
Euler steps over [0, 1] with the velocity net evaluated at interval endpoints
(s, t). num_steps is a static Python int, so the loop unrolls at trace time
(it is 1 in the shipped config). RNG is an explicit jax.random key — the
reference uses implicit global RNG state (flow_lm.py:106-109), which has no
place in a jitted TPU step.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def lsd_decode(
    v_t: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_0: jnp.ndarray,
    num_steps: int = 1,
) -> jnp.ndarray:
    """Integrate dx = v(s, t, x) dt from noise x_0 with `num_steps` Euler steps."""
    current = x_0
    B = x_0.shape[0]
    for i in range(num_steps):
        s = jnp.full((B, 1), i / num_steps, dtype=jnp.float32)
        t = jnp.full((B, 1), (i + 1) / num_steps, dtype=jnp.float32)
        flow_dir = v_t(s, t, current)
        current = current + flow_dir / num_steps
    return current


def sample_noise(
    key: jax.Array,
    shape: tuple[int, ...],
    temp: float,
    noise_clamp: Optional[float] = None,
) -> jnp.ndarray:
    """N(0, temp) noise [B, D] with optional symmetric clamping.

    The key is folded per stream (leading axis), so a stream's noise sequence
    does not depend on which other streams share its batch — batched serving
    reproduces single-stream sampling slot-for-slot.
    """
    B = shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    noise = jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype=jnp.float32))(keys)
    noise = noise * jnp.sqrt(jnp.asarray(temp, dtype=jnp.float32))
    if noise_clamp is not None:
        noise = jnp.clip(noise, -noise_clamp, noise_clamp)
    return noise

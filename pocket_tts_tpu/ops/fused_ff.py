"""Pallas TPU kernel: fused pre-LN feed-forward block.

Computes x + linear2(gelu(linear1(LN(x)))) — the transformer FF residual —
in one Mosaic program, blocked over the hidden dimension so each grid step
streams one [Fb, E] slice of linear1 and the matching [E, Fb] slice of
linear2 through VMEM and accumulates the output in place. Fuses what the XLA
path executes as ~7 ops (LN stats, scale, two matmuls, gelu, residual add).

Opt-in (POCKET_TTS_FUSED_FF=1; see transformer.fused_ff_enabled) — the XLA
path remains the default and the correctness oracle.
"""

from __future__ import annotations

import functools

import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def fused_ff_enabled() -> bool:
    """Route transformer feed-forwards through the fused Pallas kernel.
    Measured slower than XLA's own fusion at decode shapes (BENCHMARKS.md);
    kept for experimentation. Read at trace time; default off."""
    return os.environ.get("POCKET_TTS_FUSED_FF", "0") not in ("0", "", "false")


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """float32 erf via Abramowitz–Stegun 7.1.26 (max abs error 1.5e-7) —
    Mosaic implements neither erf nor erfc."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, nw_ref, nb_ref, w1_ref, w2_ref, o_ref, *, eps: float):
    i = pl.program_id(0)

    x = x_ref[...]  # [B, E]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    ln = centered * lax.rsqrt(var + eps)
    ln = ln * nw_ref[...].astype(jnp.float32) + nb_ref[...].astype(jnp.float32)

    w1 = w1_ref[...]  # [Fb, E]
    h = lax.dot_general(
        ln.astype(w1.dtype), w1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, Fb]
    # exact erf-GELU via polynomial erf (see _erf)
    h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))

    w2 = w2_ref[...]  # [E, Fb]
    part = lax.dot_general(
        h.astype(w2.dtype), w2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, E]

    @pl.when(i == 0)
    def _():
        o_ref[...] = x.astype(jnp.float32) + part

    @pl.when(i > 0)
    def _():
        o_ref[...] = o_ref[...] + part


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ff(
    x: jnp.ndarray,  # [B, E]
    norm_weight: jnp.ndarray,  # [E]
    norm_bias: jnp.ndarray,  # [E]
    w1: jnp.ndarray,  # [F, E] torch layout
    w2: jnp.ndarray,  # [E, F] torch layout
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + linear2(gelu(linear1(layer_norm(x)))) -> [B, E] in x's dtype."""
    B, E = x.shape
    F = w1.shape[0]
    # Compiled Mosaic needs a TPU; everywhere else run the interpreter.
    interpret = interpret or jax.default_backend() != "tpu"

    # Hidden block: keep the two weight slices within ~4 MB of VMEM.
    bytes_per_f = E * (w1.dtype.itemsize + w2.dtype.itemsize)
    f_blk = max(128, min(F, (4 * 1024 * 1024) // max(1, bytes_per_f) // 128 * 128))
    while F % f_blk:
        f_blk //= 2
    grid = (F // f_blk,)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, E), lambda i: (0, 0)),
            pl.BlockSpec((E,), lambda i: (0,)),
            pl.BlockSpec((E,), lambda i: (0,)),
            pl.BlockSpec((f_blk, E), lambda i: (i, 0)),
            pl.BlockSpec((E, f_blk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((B, E), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, E), jnp.float32),
        interpret=interpret,
    )(x, norm_weight, norm_bias, w1, w2)
    return out.astype(x.dtype)

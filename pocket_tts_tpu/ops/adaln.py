"""AdaLN flow-matching MLP head (the velocity network of FlowLM).

Architecture and numerics follow the checkpoint exactly
(reference: pocket_tts_mlx/modules/mlp.py:53-168): two sinusoidal timestep
embedders (for the ODE interval endpoints s and t) averaged together, a
conditioning projection, `depth` AdaLN residual blocks with 3-way
shift/scale/gate modulation, and a 2-way-modulated final projection.
LayerNorms here use eps=1e-6; the timestep embedders end in the ddof=1
RMSNorm. The whole head runs in float32 — it is tiny (~10M params) and its
output integrates the ODE, so precision matters more than MXU throughput.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pocket_tts_tpu.ops.linear import linear
from pocket_tts_tpu.ops.norms import layer_norm, rms_norm_ddof1

Params = dict


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1.0 + scale) + shift


def _linear_params(key: jax.Array, out_dim: int, in_dim: int, dtype, bias: bool = True) -> Params:
    s = 1.0 / math.sqrt(in_dim)
    k_w, k_b = jax.random.split(key)
    p = {"weight": jax.random.uniform(k_w, (out_dim, in_dim), minval=-s, maxval=s, dtype=dtype)}
    if bias:
        p["bias"] = jax.random.uniform(k_b, (out_dim,), minval=-s, maxval=s, dtype=dtype)
    return p


@dataclass(frozen=True)
class TimestepEmbedder:
    """Sinusoidal frequency embedding -> Linear -> SiLU -> Linear -> RMSNorm."""

    hidden_size: int
    frequency_embedding_size: int = 256
    max_period: int = 10_000

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k0, k2 = jax.random.split(key)
        return {
            "mlp": [
                _linear_params(k0, self.hidden_size, self.frequency_embedding_size, dtype),
                {},  # SiLU placeholder to keep checkpoint indices mlp.{0,2,3}
                _linear_params(k2, self.hidden_size, self.hidden_size, dtype),
                {"alpha": jnp.ones((self.hidden_size,), dtype=dtype)},
            ]
        }

    def __call__(self, params: Params, t: jnp.ndarray) -> jnp.ndarray:
        """t: [B, 1] -> [B, hidden]."""
        half = self.frequency_embedding_size // 2
        freqs = jnp.exp(
            -math.log(self.max_period) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t.astype(jnp.float32) * freqs[None, :]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        x = linear(emb, params["mlp"][0]["weight"], params["mlp"][0]["bias"])
        x = jax.nn.silu(x)
        x = linear(x, params["mlp"][2]["weight"], params["mlp"][2]["bias"])
        return rms_norm_ddof1(x, params["mlp"][3]["alpha"], eps=1e-5)


@dataclass(frozen=True)
class ResBlock:
    """AdaLN residual block: x + gate * MLP(modulate(in_ln(x), shift, scale)).

    in_ln is an *affine* LayerNorm whose weight/bias are trained checkpoint
    parameters (reference: pocket_tts_mlx/modules/mlp.py:82 — contrast with
    FinalLayer.norm_final, which is explicitly affine-free)."""

    channels: int

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k0, k2, k_ada = jax.random.split(key, 3)
        return {
            "in_ln": {
                "weight": jnp.ones((self.channels,), dtype=dtype),
                "bias": jnp.zeros((self.channels,), dtype=dtype),
            },
            "mlp": [
                _linear_params(k0, self.channels, self.channels, dtype),
                {},
                _linear_params(k2, self.channels, self.channels, dtype),
            ],
            "adaLN_modulation": [
                {},
                _linear_params(k_ada, 3 * self.channels, self.channels, dtype),
            ],
        }

    def __call__(
        self, params: Params, x: jnp.ndarray, y: jnp.ndarray, ada: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        if ada is None:
            ada = linear(
                jax.nn.silu(y),
                params["adaLN_modulation"][1]["weight"],
                params["adaLN_modulation"][1]["bias"],
            )
        shift, scale, gate = jnp.split(ada, 3, axis=-1)
        normed = layer_norm(x, params["in_ln"]["weight"], params["in_ln"]["bias"], eps=1e-6)
        h = modulate(normed, shift, scale)
        h = linear(h, params["mlp"][0]["weight"], params["mlp"][0]["bias"])
        h = jax.nn.silu(h)
        h = linear(h, params["mlp"][2]["weight"], params["mlp"][2]["bias"])
        return x + gate * h


@dataclass(frozen=True)
class FinalLayer:
    """Affine-free LN with 2-way modulation, then output projection."""

    model_channels: int
    out_channels: int

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k_lin, k_ada = jax.random.split(key)
        return {
            "linear": _linear_params(k_lin, self.out_channels, self.model_channels, dtype),
            "adaLN_modulation": [
                {},
                _linear_params(k_ada, 2 * self.model_channels, self.model_channels, dtype),
            ],
        }

    def __call__(
        self, params: Params, x: jnp.ndarray, c: jnp.ndarray, ada: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        if ada is None:
            ada = linear(
                jax.nn.silu(c),
                params["adaLN_modulation"][1]["weight"],
                params["adaLN_modulation"][1]["bias"],
            )
        shift, scale = jnp.split(ada, 2, axis=-1)
        x = modulate(layer_norm(x, eps=1e-6), shift, scale)
        return linear(x, params["linear"]["weight"], params["linear"]["bias"])


@dataclass(frozen=True)
class SimpleMLPAdaLN:
    """The conditioned velocity field v(x; s, t, cond) integrated by lsd_decode."""

    in_channels: int
    model_channels: int
    out_channels: int
    cond_channels: int
    num_res_blocks: int
    num_time_conds: int = 2

    def __post_init__(self):
        assert self.num_time_conds != 1

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        n = self.num_time_conds
        keys = jax.random.split(key, 3 + n + self.num_res_blocks)
        embedder = TimestepEmbedder(self.model_channels)
        block = ResBlock(self.model_channels)
        return {
            "time_embed": [embedder.init_params(keys[i], dtype) for i in range(n)],
            "cond_embed": _linear_params(keys[n], self.model_channels, self.cond_channels, dtype),
            "input_proj": _linear_params(keys[n + 1], self.model_channels, self.in_channels, dtype),
            "final_layer": FinalLayer(self.model_channels, self.out_channels).init_params(
                keys[n + 2], dtype
            ),
            "res_blocks": [
                block.init_params(keys[n + 3 + i], dtype) for i in range(self.num_res_blocks)
            ],
        }

    def __call__(
        self,
        params: Params,
        c: jnp.ndarray,  # conditioning [B, cond_channels]
        s: jnp.ndarray,  # ODE interval start [B, 1]
        t: jnp.ndarray,  # ODE interval end [B, 1]
        x: jnp.ndarray,  # current latent [B, in_channels]
    ) -> jnp.ndarray:
        embedder = TimestepEmbedder(self.model_channels)
        block = ResBlock(self.model_channels)
        final = FinalLayer(self.model_channels, self.out_channels)

        x = linear(x, params["input_proj"]["weight"], params["input_proj"]["bias"])
        ts = [s, t]
        t_combined = sum(
            embedder(params["time_embed"][i], ts[i]) for i in range(self.num_time_conds)
        ) / self.num_time_conds
        c = linear(c, params["cond_embed"]["weight"], params["cond_embed"]["bias"])
        y = t_combined + c

        # All depth+1 AdaLN modulations consume the same silu(y): stack their
        # weights into ONE matmul (bitwise-identical rows, f32 accumulation).
        # The concat is loop-invariant inside the decode scan, so XLA hoists
        # it; the hot loop runs 1 projection kernel instead of depth+1.
        blocks = params["res_blocks"]
        mods = [b["adaLN_modulation"][1] for b in blocks] + [
            params["final_layer"]["adaLN_modulation"][1]
        ]
        if all(not isinstance(m["weight"], dict) for m in mods):
            w_all = jnp.concatenate([m["weight"] for m in mods], axis=0)
            b_all = jnp.concatenate([m["bias"] for m in mods], axis=0)
            ada_all = linear(jax.nn.silu(y), w_all, b_all)
            per_block = 3 * self.model_channels
            for i, block_params in enumerate(blocks):
                ada = ada_all[..., i * per_block : (i + 1) * per_block]
                x = block(block_params, x, y, ada=ada)
            final_ada = ada_all[..., len(blocks) * per_block :]
            return final(params["final_layer"], x, y, ada=final_ada)

        for block_params in blocks:
            x = block(block_params, x, y)
        return final(params["final_layer"], x, y)

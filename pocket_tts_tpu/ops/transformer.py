"""Transformer stacks shared by the FlowLM backbone and the Mimi codec.

Structure mirrors the reference
(reference: pocket_tts_mlx/modules/mimi_transformer.py:17-171): pre-LN
(eps=1e-5) blocks with exact-erf GELU feed-forward, optional LayerScale, and
one of two attention flavors — full-history causal ("flow_lm") or windowed
ring ("mimi"). Parameters and streaming state are explicit pytrees; layers
are unrolled at trace time (6 resp. 2 layers), letting XLA fuse norms and
residuals into the matmul epilogues.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pocket_tts_tpu.ops.attention import CausalKVAttention, WindowedRingAttention
from pocket_tts_tpu.ops.linear import linear
from pocket_tts_tpu.ops.norms import layer_norm

Params = dict
State = dict


def _ln_params(dim: int, dtype) -> Params:
    return {"weight": jnp.ones((dim,), dtype=dtype), "bias": jnp.zeros((dim,), dtype=dtype)}


def _ff_params(key: jax.Array, d_model: int, dim_feedforward: int, dtype) -> Params:
    k1, k2 = jax.random.split(key)
    s1 = 1.0 / (d_model ** 0.5)
    s2 = 1.0 / (dim_feedforward ** 0.5)
    return {
        "linear1": {
            "weight": jax.random.uniform(
                k1, (dim_feedforward, d_model), minval=-s1, maxval=s1, dtype=dtype
            )
        },
        "linear2": {
            "weight": jax.random.uniform(
                k2, (d_model, dim_feedforward), minval=-s2, maxval=s2, dtype=dtype
            )
        },
    }


@dataclass(frozen=True)
class StreamingTransformerLayer:
    """Pre-LN attention + feed-forward block with optional LayerScale."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    context: int | None
    max_period: float
    layer_scale: float | None = None
    attention_kind: str = "mimi"

    def __post_init__(self):
        assert self.attention_kind in ("mimi", "flow_lm")

    @property
    def self_attn(self):
        if self.attention_kind == "mimi":
            return WindowedRingAttention(
                embed_dim=self.d_model,
                num_heads=self.num_heads,
                context=self.context,
                max_period=self.max_period,
            )
        return CausalKVAttention(
            embed_dim=self.d_model, num_heads=self.num_heads, max_period=self.max_period
        )

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k_attn, k_ff = jax.random.split(key)
        params = {
            "self_attn": self.self_attn.init_params(k_attn, dtype),
            "norm1": _ln_params(self.d_model, dtype),
            "norm2": _ln_params(self.d_model, dtype),
            **_ff_params(k_ff, self.d_model, self.dim_feedforward, dtype),
        }
        if self.layer_scale is not None:
            params["layer_scale_1"] = {
                "scale": jnp.full((self.d_model,), self.layer_scale, dtype=dtype)
            }
            params["layer_scale_2"] = {
                "scale": jnp.full((self.d_model,), self.layer_scale, dtype=dtype)
            }
        return params

    def init_state(self, batch_size: int, capacity: int, dtype=jnp.float32) -> State:
        return self.self_attn.init_state(batch_size, capacity, dtype=dtype)

    def _scaled(self, params: Params, name: str, update: jnp.ndarray) -> jnp.ndarray:
        if self.layer_scale is None:
            return update
        return params[name]["scale"].astype(update.dtype) * update

    def _ff(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        h = layer_norm(x, params["norm2"]["weight"], params["norm2"]["bias"], eps=1e-5)
        h = linear(h, params["linear1"]["weight"])
        h = jax.nn.gelu(h, approximate=False)
        h = linear(h, params["linear2"]["weight"])
        return x + self._scaled(params, "layer_scale_2", h)

    def __call__(
        self,
        params: Params,
        x: jnp.ndarray,
        state: State,
        positions: jnp.ndarray,
        rope_cache: tuple | None = None,
        widx: jnp.ndarray | None = None,
        read_limit: int | None = None,
        batch_kernel: bool = False,
    ) -> tuple[jnp.ndarray, State]:
        h = layer_norm(x, params["norm1"]["weight"], params["norm1"]["bias"], eps=1e-5)
        if self.attention_kind == "flow_lm":
            update, new_state = self.self_attn(
                params["self_attn"], h, state, positions, widx, rope_cache=rope_cache,
                read_limit=read_limit, batch_kernel=batch_kernel,
            )
        else:
            update, new_state = self.self_attn(
                params["self_attn"], h, state, positions, rope_cache=rope_cache
            )
        x = x + self._scaled(params, "layer_scale_1", update)
        return self._ff(params, x), new_state

    def forward(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Non-streaming (whole-sequence) call; mimi kind only."""
        h = layer_norm(x, params["norm1"]["weight"], params["norm1"]["bias"], eps=1e-5)
        update = self.self_attn.forward(params["self_attn"], h)
        x = x + self._scaled(params, "layer_scale_1", update)
        return self._ff(params, x)


@dataclass(frozen=True)
class StreamingTransformer:
    """Stack of streaming transformer layers sharing the RoPE period."""

    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int
    context: int | None = None
    max_period: float = 10_000.0
    layer_scale: float | None = None
    kind: str = "mimi"

    @property
    def layers(self) -> tuple[StreamingTransformerLayer, ...]:
        return tuple(
            StreamingTransformerLayer(
                d_model=self.d_model,
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                context=self.context,
                max_period=self.max_period,
                layer_scale=self.layer_scale,
                attention_kind=self.kind,
            )
            for _ in range(self.num_layers)
        )

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, self.num_layers)
        return {"layers": [l.init_params(k, dtype) for l, k in zip(self.layers, keys)]}

    def init_state(self, batch_size: int, capacity: int, dtype=jnp.float32) -> State:
        state: State = {
            "layers": [l.init_state(batch_size, capacity, dtype) for l in self.layers],
        }
        if self.kind == "flow_lm":
            # One write index for the whole stack (all layers append in lockstep).
            state["widx"] = jnp.zeros((), dtype=jnp.int32)
        return state

    def __call__(
        self, params: Params, x: jnp.ndarray, state: State, positions: jnp.ndarray,
        read_limit: int | None = None,
        batch_kernel: bool = False,
    ) -> tuple[jnp.ndarray, State]:
        from pocket_tts_tpu.ops.rope import rope_angles

        # RoPE angles depend only on positions — compute once, share per layer.
        rope_cache = rope_angles(
            jnp.maximum(positions, 0), self.d_model // self.num_heads, self.max_period
        )
        widx = state.get("widx")
        if (
            "fused" in params
            and self.kind == "flow_lm"
            and x.shape[0] == 1
            and x.shape[1] == 1
            and self._fused_capacity_ok(state)
        ):
            # The B=1 megakernel DMAs whole cache rows; read_limit is a
            # batch-path (XLA) optimization and is ignored here.
            return self._fused_decode(params, x, state, positions, rope_cache, widx)
        new_layer_states = []
        for layer, l_params, l_state in zip(self.layers, params["layers"], state["layers"]):
            x, l_state = layer(l_params, x, l_state, positions, rope_cache=rope_cache,
                               widx=widx, read_limit=read_limit,
                               batch_kernel=batch_kernel)
            new_layer_states.append(l_state)
        new_state: State = {"layers": new_layer_states}
        if widx is not None:
            new_state["widx"] = widx + x.shape[1]
        return x, new_state

    @staticmethod
    def _fused_capacity_ok(state: State, kind: str = "body") -> bool:
        """The megakernel holds one layer's K and V in VMEM scratch
        (~16 MB/core total, of which ~4.5 MB goes to weight-chunk double
        buffers + activations). Past ~8 MB of KV scratch (C=2048 bf16) the
        kernel would fail to compile — long-context sessions fall back to the
        XLA path for those (rare) capacity buckets. When the load-time
        compile probe has a verdict for this capacity bucket
        (fused_backbone.bucket_allows), it overrides the static threshold."""
        from pocket_tts_tpu.ops.fused_backbone import bucket_allows

        k = state["layers"][0]["k"]  # [B, C, H, d] slot-major
        if k.dtype == jnp.int8:
            # int8-KV cache (batch serving mode): the megakernels DMA raw
            # bf16 cache rows and carry no scale plumbing — XLA path.
            return False
        kv_bytes = 2 * k.shape[1] * k.shape[2] * k.shape[3] * k.dtype.itemsize
        return bucket_allows(kind, k.shape[1], kv_bytes <= 8 * 1024 * 1024)

    def _fused_decode(
        self, params: Params, x, state: State, positions, rope_cache, widx
    ) -> tuple[jnp.ndarray, State]:
        """B=1, T=1 decode through the whole-backbone Pallas megakernel
        (ops/fused_backbone.py). The cache append stays out here — one
        in-place dynamic_update_slice per layer under donation — so states
        keep the exact layout of the XLA path."""
        from jax import lax

        from pocket_tts_tpu.ops.fused_backbone import (
            fused_backbone_decode,
            fused_int8_act_enabled,
            select_modes,
        )

        cos, sin = rope_cache  # [1, 1, 1, d/2]
        layers = state["layers"]
        k0 = layers[0]["k"]  # [1, C, H, d] slot-major
        kv_bytes = 2 * k0.shape[1] * k0.shape[2] * k0.shape[3] * k0.dtype.itemsize
        attn_mode, block = select_modes(kv_bytes, k0.shape[1])
        # The kernel appends the new (k, v) row at widx itself (aliased
        # cache outputs + in-kernel DMA): the 12 per-frame
        # dynamic_update_slice launches this loop used to issue were a
        # measurable share of the launch-count-bound scan skeleton.
        y, new_ks, new_vs = fused_backbone_decode(
            params["fused"],
            x[:, 0, :],
            tuple(l["k"] for l in layers),
            tuple(l["v"] for l in layers),
            layers[0]["slot_pos"],
            positions[:, 0],
            cos[0, 0, 0],
            sin[0, 0, 0],
            widx=jnp.reshape(widx, (1,)).astype(jnp.int32),
            num_heads=self.num_heads,
            int8_act=fused_int8_act_enabled(),
            attn_mode=attn_mode,
            block=block,
        )
        new_layers = []
        for i, l in enumerate(layers):
            new_layers.append(
                {
                    "k": new_ks[i][None],
                    "v": new_vs[i][None],
                    "slot_pos": lax.dynamic_update_slice(
                        l["slot_pos"], positions, (0, widx)
                    ),
                }
            )
        return y[:, None, :].astype(x.dtype), {"layers": new_layers, "widx": widx + 1}

    def forward(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        for layer, l_params in zip(self.layers, params["layers"]):
            x = layer.forward(l_params, x)
        return x


@dataclass(frozen=True)
class ProjectedTransformer:
    """Transformer with input/output projections operating on [B, C, T]
    (reference: pocket_tts_mlx/modules/mimi_transformer.py:123-171)."""

    input_dimension: int
    output_dimensions: tuple[int, ...]
    d_model: int
    num_heads: int
    num_layers: int
    layer_scale: float
    context: int
    max_period: float
    dim_feedforward: int

    @property
    def transformer(self) -> StreamingTransformer:
        return StreamingTransformer(
            d_model=self.d_model,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            dim_feedforward=self.dim_feedforward,
            context=self.context,
            max_period=self.max_period,
            layer_scale=self.layer_scale,
            kind="mimi",
        )

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k_t, k_in, k_out = jax.random.split(key, 3)
        params: Params = {"transformer": self.transformer.init_params(k_t, dtype)}
        if self.d_model != self.input_dimension:
            s = 1.0 / (self.input_dimension ** 0.5)
            params["input_proj"] = {
                "weight": jax.random.uniform(
                    k_in, (self.d_model, self.input_dimension), minval=-s, maxval=s, dtype=dtype
                )
            }
        out_params = []
        out_keys = jax.random.split(k_out, max(1, len(self.output_dimensions)))
        for dim, k in zip(self.output_dimensions, out_keys):
            if dim == self.d_model:
                out_params.append({})
            else:
                s = 1.0 / (self.d_model ** 0.5)
                out_params.append(
                    {
                        "weight": jax.random.uniform(
                            k, (dim, self.d_model), minval=-s, maxval=s, dtype=dtype
                        )
                    }
                )
        params["output_projs"] = out_params
        return params

    def init_state(self, batch_size: int, capacity: int | None = None, dtype=jnp.float32) -> State:
        if capacity is None:
            capacity = ((self.context + 127) // 128 + 1) * 128
        return self.transformer.init_state(batch_size, capacity, dtype)

    def _project_in(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x = x.transpose(0, 2, 1)  # [B, C, T] -> [B, T, C]
        if "input_proj" in params:
            x = linear(x, params["input_proj"]["weight"])
        return x

    def _project_out(self, params: Params, z: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
        ys = []
        for proj in params["output_projs"]:
            y = linear(z, proj["weight"]) if "weight" in proj else z
            ys.append(y.transpose(0, 2, 1))  # [B, T, C] -> [B, C, T]
        return tuple(ys)

    def __call__(
        self, params: Params, x: jnp.ndarray, state: State, positions: jnp.ndarray
    ) -> tuple[tuple[jnp.ndarray, ...], State]:
        h = self._project_in(params, x)
        z, new_state = self.transformer(params["transformer"], h, state, positions)
        return self._project_out(params, z), new_state

    def forward(self, params: Params, x: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
        h = self._project_in(params, x)
        z = self.transformer.forward(params["transformer"], h)
        return self._project_out(params, z)

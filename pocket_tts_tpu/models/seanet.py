"""SEANet convolutional encoder/decoder (the Mimi vocoder front/back-end).

Structure mirrors the reference exactly so checkpoints map one-to-one
(reference: pocket_tts_mlx/modules/seanet.py:9-170): parameters live under
the same `model.{i}` / `block.{i}` indices, with ELU activations occupying
parameterless slots. All layers are the streaming conv primitives from
ops/conv.py; the full decode of one 80 ms frame is a static-shape chain
16 -> 96 -> 480 -> 1920 samples that XLA fuses aggressively.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pocket_tts_tpu.ops.conv import StreamingConv1d, StreamingConvTranspose1d

Params = dict
State = dict


def _elu(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    return jax.nn.elu(x, alpha)


@dataclass(frozen=True)
class SEANetResnetBlock:
    """ELU + conv (+ ELU + conv) with a residual connection."""

    dim: int
    kernel_sizes: tuple[int, ...] = (3, 1)
    dilations: tuple[int, ...] = (1, 1)
    pad_mode: str = "constant"
    compress: int = 2

    @property
    def block(self) -> tuple:
        """Layer list mirroring reference indices: (elu, conv, elu, conv)."""
        hidden = self.dim // self.compress
        layers: list = []
        n = len(self.kernel_sizes)
        for i, (kernel_size, dilation) in enumerate(zip(self.kernel_sizes, self.dilations)):
            in_chs = self.dim if i == 0 else hidden
            out_chs = self.dim if i == n - 1 else hidden
            layers.append(None)  # ELU
            layers.append(
                StreamingConv1d(
                    in_chs, out_chs, kernel_size=kernel_size, dilation=dilation,
                    pad_mode=self.pad_mode,
                )
            )
        return tuple(layers)

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, len(self.block))
        return {
            "block": [
                {} if layer is None else {"conv": layer.init_params(k, dtype)}
                for layer, k in zip(self.block, keys)
            ]
        }

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        return {
            "block": [
                {} if layer is None else layer.init_state(batch_size, dtype)
                for layer in self.block
            ]
        }

    def __call__(self, params: Params, x: jnp.ndarray, state: State) -> tuple[jnp.ndarray, State]:
        v = x
        new_states = []
        for layer, l_params, l_state in zip(self.block, params["block"], state["block"]):
            if layer is None:
                v = _elu(v)
                new_states.append(l_state)
            else:
                v, s = layer(l_params["conv"], v, l_state)
                new_states.append(s)
        return x + v, {"block": new_states}

    def forward(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        v = x
        for layer, l_params in zip(self.block, params["block"]):
            v = _elu(v) if layer is None else layer.forward(l_params["conv"], v)
        return x + v


def _iterate(layers, params, x, state=None, final_dtype=None):
    """Run a (layer, params[, state]) chain, streaming if state is given.

    `final_dtype` makes the LAST layer (the decoder's waveform-emitting
    conv) return that dtype: under bf16 serving the features flow bf16
    through the chain but the emitted waveform stays a float32 island
    (the conv accumulates in f32 either way — see ops/conv.conv1d)."""
    last = len(layers) - 1
    if state is None:
        for i, (layer, l_params) in enumerate(zip(layers, params["model"])):
            if layer is None:
                x = _elu(x)
            elif isinstance(layer, SEANetResnetBlock):
                x = layer.forward(l_params, x)
            else:
                key = "convtr" if isinstance(layer, StreamingConvTranspose1d) else "conv"
                x = layer.forward(l_params[key], x)
                if final_dtype is not None and i == last:
                    x = x.astype(final_dtype)
        return x, None
    new_states = []
    for i, (layer, l_params, l_state) in enumerate(
        zip(layers, params["model"], state["model"])
    ):
        if layer is None:
            x = _elu(x)
            new_states.append(l_state)
        elif isinstance(layer, SEANetResnetBlock):
            x, s = layer(l_params, x, l_state)
            new_states.append(s)
        else:
            key = "convtr" if isinstance(layer, StreamingConvTranspose1d) else "conv"
            if final_dtype is not None and i == last and key == "conv":
                x, s = layer(l_params[key], x, l_state, out_dtype=final_dtype)
            else:
                x, s = layer(l_params[key], x, l_state)
            new_states.append(s)
    return x, {"model": new_states}


def _init_chain_params(layers, key, dtype) -> Params:
    keys = jax.random.split(key, len(layers))
    out = []
    for layer, k in zip(layers, keys):
        if layer is None:
            out.append({})
        elif isinstance(layer, SEANetResnetBlock):
            out.append(layer.init_params(k, dtype))
        else:
            name = "convtr" if isinstance(layer, StreamingConvTranspose1d) else "conv"
            out.append({name: layer.init_params(k, dtype)})
    return {"model": out}


def _init_chain_state(layers, batch_size, dtype) -> State:
    out = []
    for layer in layers:
        if layer is None:
            out.append({})
        else:
            out.append(layer.init_state(batch_size, dtype))
    return {"model": out}


@dataclass(frozen=True)
class SEANetEncoder:
    """Waveform [B, 1, T] -> features [B, dimension, T/hop] at 200 Hz."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 3
    ratios: tuple[int, ...] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    pad_mode: str = "constant"
    compress: int = 2

    @property
    def enc_ratios(self) -> tuple[int, ...]:
        return tuple(reversed(self.ratios))

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out

    @property
    def model(self) -> tuple:
        layers: list = [
            StreamingConv1d(
                self.channels, self.n_filters, self.kernel_size, pad_mode=self.pad_mode
            )
        ]
        mult = 1
        for ratio in self.enc_ratios:
            for j in range(self.n_residual_layers):
                layers.append(
                    SEANetResnetBlock(
                        mult * self.n_filters,
                        kernel_sizes=(self.residual_kernel_size, 1),
                        dilations=(self.dilation_base ** j, 1),
                        pad_mode=self.pad_mode,
                        compress=self.compress,
                    )
                )
            layers.append(None)  # ELU
            layers.append(
                StreamingConv1d(
                    mult * self.n_filters,
                    mult * self.n_filters * 2,
                    kernel_size=ratio * 2,
                    stride=ratio,
                    pad_mode=self.pad_mode,
                )
            )
            mult *= 2
        layers.append(None)  # ELU
        layers.append(
            StreamingConv1d(
                mult * self.n_filters, self.dimension, self.last_kernel_size,
                pad_mode=self.pad_mode,
            )
        )
        return tuple(layers)

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return _init_chain_params(self.model, key, dtype)

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        return _init_chain_state(self.model, batch_size, dtype)

    def __call__(self, params: Params, x: jnp.ndarray, state: State) -> tuple[jnp.ndarray, State]:
        return _iterate(self.model, params, x, state)

    def forward(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        y, _ = _iterate(self.model, params, x)
        return y


@dataclass(frozen=True)
class SEANetDecoder:
    """Features [B, dimension, T] -> waveform [B, 1, T*hop]."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 3
    ratios: tuple[int, ...] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    pad_mode: str = "constant"
    compress: int = 2

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out

    @property
    def model(self) -> tuple:
        mult = 2 ** len(self.ratios)
        layers: list = [
            StreamingConv1d(
                self.dimension, mult * self.n_filters, self.kernel_size, pad_mode=self.pad_mode
            )
        ]
        for ratio in self.ratios:
            layers.append(None)  # ELU
            layers.append(
                StreamingConvTranspose1d(
                    mult * self.n_filters,
                    mult * self.n_filters // 2,
                    kernel_size=ratio * 2,
                    stride=ratio,
                )
            )
            for j in range(self.n_residual_layers):
                layers.append(
                    SEANetResnetBlock(
                        mult * self.n_filters // 2,
                        kernel_sizes=(self.residual_kernel_size, 1),
                        dilations=(self.dilation_base ** j, 1),
                        pad_mode=self.pad_mode,
                        compress=self.compress,
                    )
                )
            mult //= 2
        layers.append(None)  # ELU
        layers.append(
            StreamingConv1d(
                self.n_filters, self.channels, self.last_kernel_size, pad_mode=self.pad_mode
            )
        )
        return tuple(layers)

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return _init_chain_params(self.model, key, dtype)

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        return _init_chain_state(self.model, batch_size, dtype)

    def __call__(self, params: Params, z: jnp.ndarray, state: State) -> tuple[jnp.ndarray, State]:
        return _iterate(self.model, params, z, state, final_dtype=jnp.float32)

    def forward(self, params: Params, z: jnp.ndarray) -> jnp.ndarray:
        y, _ = _iterate(self.model, params, z, final_dtype=jnp.float32)
        return y

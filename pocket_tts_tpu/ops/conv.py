"""Streaming 1D convolutions as pure functions over explicit state pytrees.

Re-implements the chunk-invariance contract of the reference streaming convs
(reference: pocket_tts_mlx/modules/conv.py:74-200): feeding a signal chunk by
chunk produces bit-identical output to one full-sequence call. Unlike the
reference, state is an explicit pytree threaded through jitted calls, so the
whole codec decode step compiles to a single XLA computation with static
shapes.

Layout conventions (chosen for zero-copy checkpoint loading and MXU-friendly
compute):
  - activations: [B, C, T] ('NCH')
  - Conv1d weight: torch layout (out, in/groups, k) used directly via
    dimension_numbers ('NCH','OIH','NCH')
  - ConvTranspose1d weight: converted once at load time from torch layout
    (in, out/groups, k) to grad-conv layout (out, in/groups, k) with the
    spatial axis flipped (see convtr_weight_from_torch); the transposed conv
    then runs as an input-dilated regular convolution, which XLA lowers to
    MXU matmuls.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict
State = dict


def conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    out_dtype=None,
) -> jnp.ndarray:
    """VALID 1D convolution, torch-layout weight (out, in/groups, k).

    Mixed precision follows linear(): activations cast down to the weight
    dtype, float32 accumulation, result in the activation dtype (or
    `out_dtype` when given — the waveform-emitting final conv returns
    float32 from bf16 features at no extra HBM traffic, since the
    accumulation is float32 either way).
    """
    if out_dtype is None:
        out_dtype = x.dtype
    if weight.dtype != x.dtype:
        x = x.astype(weight.dtype)
    y = lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None]
    return y


def conv_transpose1d(
    x: jnp.ndarray,
    weight_oih_flipped: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Full (untrimmed) transposed convolution: output length (T-1)*S + K.

    Implemented as an lhs-dilated regular convolution; `weight_oih_flipped`
    must come from convtr_weight_from_torch().
    """
    k = weight_oih_flipped.shape[-1]
    out_dtype = x.dtype
    if weight_oih_flipped.dtype != x.dtype:
        x = x.astype(weight_oih_flipped.dtype)
    y = lax.conv_general_dilated(
        x,
        weight_oih_flipped,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None]
    return y


def convtr_weight_from_torch(w: np.ndarray, groups: int = 1) -> np.ndarray:
    """torch ConvTranspose1d weight (in, out/g, k) -> grad-conv (out, in/g, k), flipped."""
    cin, cout_per_g, k = w.shape
    w = w.reshape(groups, cin // groups, cout_per_g, k)
    w = np.transpose(w, (0, 2, 1, 3)).reshape(groups * cout_per_g, cin // groups, k)
    return np.ascontiguousarray(w[:, :, ::-1])


def get_extra_padding_for_conv1d(
    length: int, kernel_size: int, stride: int, padding_total: int = 0
) -> int:
    """End padding so the conv consumes the signal in whole frames
    (reference: pocket_tts_mlx/modules/conv.py:12-17)."""
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return int(ideal_length - length)


def pad_for_conv1d(x: jnp.ndarray, kernel_size: int, stride: int, padding_total: int = 0):
    """Zero-pad the end of [B, C, T] for whole-frame convolution."""
    extra = get_extra_padding_for_conv1d(x.shape[-1], kernel_size, stride, padding_total)
    if extra > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, extra)))
    return x


@dataclass(frozen=True)
class StreamingConv1d:
    """Causal streaming Conv1d.

    Carries the trailing (effective_kernel - stride) input columns between
    chunks; with pad_mode='replicate' the very first chunk is left-padded
    with its own first sample (reference: pocket_tts_mlx/modules/conv.py:113-150).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    pad_mode: str = "constant"

    def __post_init__(self):
        assert self.pad_mode in ("constant", "replicate")

    @property
    def effective_kernel_size(self) -> int:
        return (self.kernel_size - 1) * self.dilation + 1

    @property
    def overlap(self) -> int:
        return self.effective_kernel_size - self.stride

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k_w, _ = jax.random.split(key)
        fan_in = self.in_channels // self.groups * self.kernel_size
        scale = 1.0 / math.sqrt(fan_in)
        params = {
            "weight": jax.random.uniform(
                k_w,
                (self.out_channels, self.in_channels // self.groups, self.kernel_size),
                minval=-scale,
                maxval=scale,
                dtype=dtype,
            )
        }
        if self.bias:
            params["bias"] = jnp.zeros((self.out_channels,), dtype=dtype)
        return params

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        state: State = {
            "previous": jnp.zeros((batch_size, self.in_channels, self.overlap), dtype=dtype)
        }
        if self.pad_mode == "replicate":
            state["first"] = jnp.ones((batch_size,), dtype=jnp.bool_)
        return state

    def __call__(
        self, params: Params, x: jnp.ndarray, state: State, out_dtype=None
    ) -> tuple[jnp.ndarray, State]:
        """Streaming step on a chunk [B, C, T]; T must be a multiple of stride."""
        B, C, T = x.shape
        assert T > 0 and T % self.stride == 0, "chunk length must be a multiple of stride"
        overlap = self.overlap
        if overlap:
            previous = state["previous"]
            if self.pad_mode == "replicate":
                previous = jnp.where(
                    state["first"][:, None, None], x[:, :, :1].astype(previous.dtype), previous
                )
            x = jnp.concatenate([previous.astype(x.dtype), x], axis=-1)
        y = conv1d(
            x,
            params["weight"],
            params.get("bias"),
            stride=self.stride,
            dilation=self.dilation,
            groups=self.groups,
            out_dtype=out_dtype,
        )
        new_state = dict(state)
        if overlap:
            # Stored in the state's own dtype: under bf16 activations the
            # carry buffers keep their float32 avals (jit carry stability;
            # bf16 -> f32 -> bf16 round-trips losslessly on the next chunk).
            new_state["previous"] = x[:, :, -overlap:].astype(state["previous"].dtype)
            if self.pad_mode == "replicate":
                new_state["first"] = jnp.zeros_like(state["first"])
        return y, new_state

    def forward(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Non-streaming call: left-pad by the overlap (zeros or edge value)."""
        overlap = self.overlap
        if overlap:
            mode = "edge" if self.pad_mode == "replicate" else "constant"
            x = jnp.pad(x, ((0, 0), (0, 0), (overlap, 0)), mode=mode)
        return conv1d(
            x,
            params["weight"],
            params.get("bias"),
            stride=self.stride,
            dilation=self.dilation,
            groups=self.groups,
        )


@dataclass(frozen=True)
class StreamingConvTranspose1d:
    """Streaming ConvTranspose1d with overlap-add across chunks.

    Each chunk emits T*stride samples; the trailing (kernel - stride) partial
    columns are carried (bias-subtracted) and added into the next chunk's head
    (reference: pocket_tts_mlx/modules/conv.py:153-200).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    bias: bool = True

    @property
    def overlap(self) -> int:
        return self.kernel_size - self.stride

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k_w, _ = jax.random.split(key)
        fan_in = self.in_channels // self.groups * self.kernel_size
        scale = 1.0 / math.sqrt(fan_in)
        params = {
            "weight": jax.random.uniform(
                k_w,
                (self.out_channels, self.in_channels // self.groups, self.kernel_size),
                minval=-scale,
                maxval=scale,
                dtype=dtype,
            )
        }
        if self.bias:
            params["bias"] = jnp.zeros((self.out_channels,), dtype=dtype)
        return params

    def init_state(self, batch_size: int, dtype=jnp.float32) -> State:
        return {"partial": jnp.zeros((batch_size, self.out_channels, self.overlap), dtype=dtype)}

    def __call__(self, params: Params, x: jnp.ndarray, state: State) -> tuple[jnp.ndarray, State]:
        """Streaming step: [B, C, T] -> [B, C', T*stride] plus carried partial."""
        y = conv_transpose1d(
            x, params["weight"], params.get("bias"), stride=self.stride, groups=self.groups
        )
        overlap = self.overlap
        if overlap == 0:
            return y, state
        partial = state["partial"].astype(y.dtype)
        y = y.at[:, :, : overlap].add(partial)
        new_partial = y[:, :, -overlap:]
        bias = params.get("bias")
        if bias is not None:
            new_partial = new_partial - bias.astype(y.dtype)[None, :, None]
        # Carried in the state's own dtype (f32) so the jit carry aval is
        # stable under bf16 activations.
        return y[:, :, :-overlap], {"partial": new_partial.astype(state["partial"].dtype)}

    def forward(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Non-streaming call: emit T*stride samples (drop the trailing partial)."""
        y = conv_transpose1d(
            x, params["weight"], params.get("bias"), stride=self.stride, groups=self.groups
        )
        if self.overlap:
            y = y[:, :, : -self.overlap]
        return y

"""Mimi neural codec: waveform <-> 512-d latent frames.

Mirrors the reference wrapper (reference: pocket_tts_mlx/models/mimi.py:17-85)
with explicit functional state. The decode path (1 latent frame -> 1920
samples at 24 kHz) is fully static-shape:

    [B, 32, 1] --quantizer 1x1 conv--> [B, 512, 1]
      --depthwise ConvTranspose stride 16--> [B, 512, 16]  (200 Hz)
      --2-layer windowed transformer (ring ctx 250)--> [B, 512, 16]
      --SEANet decoder (x6, x5, x4 transposed convs)--> [B, 1, 1920]

so the whole frame decode jits into one XLA computation with no host syncs.
The encode path (voice cloning) runs non-streaming over the entire prompt.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config.schema import MimiConfig
from pocket_tts_tpu.ops.conv import (
    StreamingConv1d,
    StreamingConvTranspose1d,
    conv1d,
    pad_for_conv1d,
)
from pocket_tts_tpu.ops.transformer import ProjectedTransformer
from pocket_tts_tpu.models.seanet import SEANetDecoder, SEANetEncoder

Params = dict
State = dict


@dataclass(frozen=True)
class MimiModel:
    """Static description of the codec; params/state are explicit pytrees."""

    config: MimiConfig

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def frame_rate(self) -> float:
        return self.config.frame_rate

    @property
    def frame_size(self) -> int:
        return int(self.config.sample_rate / self.config.frame_rate)

    @property
    def encoder(self) -> SEANetEncoder:
        s = self.config.seanet
        return SEANetEncoder(
            channels=s.channels,
            dimension=s.dimension,
            n_filters=s.n_filters,
            n_residual_layers=s.n_residual_layers,
            ratios=tuple(s.ratios),
            kernel_size=s.kernel_size,
            last_kernel_size=s.last_kernel_size,
            residual_kernel_size=s.residual_kernel_size,
            dilation_base=s.dilation_base,
            pad_mode=s.pad_mode,
            compress=s.compress,
        )

    @property
    def decoder(self) -> SEANetDecoder:
        s = self.config.seanet
        return SEANetDecoder(
            channels=s.channels,
            dimension=s.dimension,
            n_filters=s.n_filters,
            n_residual_layers=s.n_residual_layers,
            ratios=tuple(s.ratios),
            kernel_size=s.kernel_size,
            last_kernel_size=s.last_kernel_size,
            residual_kernel_size=s.residual_kernel_size,
            dilation_base=s.dilation_base,
            pad_mode=s.pad_mode,
            compress=s.compress,
        )

    def _projected_transformer(self) -> ProjectedTransformer:
        t = self.config.transformer
        return ProjectedTransformer(
            input_dimension=t.input_dimension,
            output_dimensions=tuple(t.output_dimensions),
            d_model=t.d_model,
            num_heads=t.num_heads,
            num_layers=t.num_layers,
            layer_scale=t.layer_scale,
            context=t.context,
            max_period=t.max_period,
            dim_feedforward=t.dim_feedforward,
        )

    @property
    def encoder_transformer(self) -> ProjectedTransformer:
        return self._projected_transformer()

    @property
    def decoder_transformer(self) -> ProjectedTransformer:
        return self._projected_transformer()

    @property
    def encoder_frame_rate(self) -> float:
        return self.config.sample_rate / self.encoder.hop_length

    @property
    def downsample_stride(self) -> int:
        stride = self.encoder_frame_rate / self.config.frame_rate
        assert stride == int(stride), "encoder rate must be an integer multiple of frame rate"
        return int(stride)

    @property
    def has_resample(self) -> bool:
        return self.encoder_frame_rate != self.config.frame_rate

    @property
    def downsample(self) -> StreamingConv1d:
        s = self.downsample_stride
        return StreamingConv1d(
            self.config.seanet.dimension,
            self.config.seanet.dimension,
            kernel_size=2 * s,
            stride=s,
            bias=False,
            pad_mode="replicate",
        )

    @property
    def upsample(self) -> StreamingConvTranspose1d:
        s = self.downsample_stride
        dim = self.config.seanet.dimension
        return StreamingConvTranspose1d(
            dim, dim, kernel_size=2 * s, stride=s, groups=dim, bias=False
        )

    # ------------------------------------------------------------------ params

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, 6)
        q_dim = self.config.quantizer.dimension
        q_out = self.config.quantizer.output_dimension
        scale = 1.0 / (q_dim ** 0.5)
        params: Params = {
            "encoder": self.encoder.init_params(keys[0], dtype),
            "decoder": self.decoder.init_params(keys[1], dtype),
            "encoder_transformer": self.encoder_transformer.init_params(keys[2], dtype),
            "decoder_transformer": self.decoder_transformer.init_params(keys[3], dtype),
            "quantizer": {
                "output_proj": {
                    "weight": jax.random.uniform(
                        keys[4], (q_out, q_dim, 1), minval=-scale, maxval=scale, dtype=dtype
                    )
                }
            },
        }
        if self.has_resample:
            params["downsample"] = {"conv": {"conv": self.downsample.init_params(keys[5], dtype)}}
            params["upsample"] = {"convtr": {"convtr": self.upsample.init_params(keys[5], dtype)}}
        return params

    def init_decode_state(
        self, batch_size: int, kv_dtype=jnp.float32, max_chunk_frames: int = 1
    ) -> State:
        """Streaming state for the chunked decode path.

        kv_dtype applies to the codec transformer's ring KV cache only; conv
        overlap buffers stay float32 — they add directly into the waveform.
        max_chunk_frames sizes the transformer's shift-append ring: it must
        retain a full attention window PLUS the largest chunk decoded in one
        call (the fused segment step vocodes whole S-frame segments at once).
        """
        chunk = max(1, max_chunk_frames) * (
            self.downsample_stride if self.has_resample else 1
        )
        t = self.config.transformer
        ring_capacity = ((t.context + chunk + 127) // 128 + 1) * 128
        state: State = {
            "decoder_transformer": self.decoder_transformer.init_state(
                batch_size, capacity=ring_capacity, dtype=kv_dtype
            ),
            "decoder": self.decoder.init_state(batch_size, jnp.float32),
            "pos": jnp.zeros((batch_size,), dtype=jnp.int32),  # 200 Hz step count
        }
        if self.has_resample:
            state["upsample"] = self.upsample.init_state(batch_size, jnp.float32)
        return state

    # ------------------------------------------------------------------ apply

    def quantize(self, params: Params, latent: jnp.ndarray) -> jnp.ndarray:
        """'DummyQuantizer': 1x1 conv projecting [B, 32, T] -> [B, 512, T]
        (reference: pocket_tts_mlx/modules/dummy_quantizer.py:7-19).

        Emits the weight's serving dtype: decode_from_latent casts to it
        anyway, so writing f32 here only to round it at the next op would
        double the [B, 512, T] traffic for bit-identical values."""
        w = params["quantizer"]["output_proj"]["weight"]
        return conv1d(latent, w, out_dtype=w.dtype)

    def decode_from_latent(
        self, params: Params, latent: jnp.ndarray, state: State
    ) -> tuple[jnp.ndarray, State]:
        """Decode quantized latent frames [B, 512, T] into waveform
        [B, 1, T*frame_size], advancing all streaming state.

        Activations follow the serving weight dtype through the upsampler,
        codec transformer and SEANet chain (bf16 halves the vocoder's HBM
        activation traffic — the largest batch-regime phase); the emitted
        waveform itself returns float32 (SEANetDecoder's final_dtype
        island), and all carried conv overlap buffers stay float32."""
        new_state = dict(state)
        wdt = params["decoder"]["model"][0]["conv"]["weight"].dtype
        emb = latent.astype(wdt)
        if self.has_resample:
            emb, new_state["upsample"] = self.upsample(
                params["upsample"]["convtr"]["convtr"], emb, state["upsample"]
            )
        positions = state["pos"][:, None] + jnp.arange(emb.shape[-1], dtype=jnp.int32)[None, :]
        (emb,), new_state["decoder_transformer"] = self.decoder_transformer(
            params["decoder_transformer"], emb, state["decoder_transformer"], positions
        )
        out, new_state["decoder"] = self.decoder(params["decoder"], emb, state["decoder"])
        new_state["pos"] = state["pos"] + emb.shape[-1]
        return out, new_state

    def encode_to_latent(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Encode waveform [B, C, T] -> latent [B, 512, T'@12.5Hz], non-streaming
        (used for voice cloning; reference: pocket_tts_mlx/models/mimi.py:77-85)."""
        assert x.ndim == 3, f"expected [B, C, T], got {x.shape}"
        x = pad_for_conv1d(x, self.frame_size, self.frame_size)
        emb = self.encoder.forward(params["encoder"], x)
        (emb,) = self.encoder_transformer.forward(params["encoder_transformer"], emb)
        if self.has_resample:
            emb = self.downsample.forward(params["downsample"]["conv"]["conv"], emb)
        return emb

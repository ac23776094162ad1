"""The fused generate step: FlowLM decode + EOS bookkeeping + Mimi vocoder.

This is the hot path of the whole framework — one pure function stepped by
`lax.scan` for S frames. Everything the reference does per frame in Python
with a device sync (reference: pocket_tts_mlx/models/tts_model.py:402-428)
happens here on-device:

    FlowLM transformer step (KV cache append)       flow_lm.decode_step
    EOS logit test + eos_step/frames_after_eos      carry updates
    noise draw + flow-matching ODE                  ops/sampling
    latent denorm + 1x1 quantizer projection        mimi.quantize
    upsample + codec transformer + SEANet vocoder   mimi.decode_from_latent

Shared by TTSModel (single-chip serving), the multi-chip dryrun, and the
benchmark harness.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel


def decode_mimi_frame(flow_params, mimi_params, mimi, latent, mimi_state):
    """Denormalize a FlowLM latent and vocode one frame [B, frame] (shared by
    the fused segment step, warmup, and the serving engine)."""
    mimi_in = (latent * flow_params["emb_std"] + flow_params["emb_mean"])[:, :, None]
    quantized = mimi.quantize(mimi_params, mimi_in)
    frame, mimi_state = mimi.decode_from_latent(mimi_params, quantized, mimi_state)
    return frame[:, 0, :], mimi_state


def initial_carry(flow_lm: FlowLMModel, batch: int, frames_after_eos, max_gen) -> dict:
    """Fresh decode carry for a batch: BOS flags, EOS sentinels, step counters.

    `step` is per-stream so the continuous-batching engine can admit new
    streams mid-flight; `tick` is the global frame counter used only for RNG
    folding (equal to step for whole-batch generation)."""
    return {
        "latent": jnp.zeros((batch, flow_lm.ldim), dtype=jnp.float32),
        "is_bos": jnp.ones((batch,), dtype=jnp.bool_),
        "eos_step": jnp.full((batch,), 2**30, dtype=jnp.int32),
        "step": jnp.zeros((batch,), dtype=jnp.int32),
        "tick": jnp.zeros((), dtype=jnp.int32),
        "frames_after_eos": jnp.asarray(frames_after_eos, dtype=jnp.int32),
        "max_gen": jnp.asarray(max_gen, dtype=jnp.int32),
    }


def make_segment_fn(
    flow_lm: FlowLMModel,
    mimi: MimiModel,
    lsd_decode_steps: int,
    noise_clamp: Optional[float],
    segment_frames: int,
    unroll: int = 1,
):
    """Build the pure segment function.

    fn(params, flow_state, mimi_state, carry, rng, temp, eos_threshold)
      -> (flow_state, mimi_state, carry, audio [B,S,frame], emit [B,S], all_done)

    `rng` is the per-generation key; each frame folds in the absolute step
    index, so outputs are independent of how frames are grouped into segments.
    """

    def fn(params, flow_state, mimi_state, carry, rng, temp, eos_threshold):
        flow_params = params["flow_lm"]
        mimi_params = params["mimi"]

        def step(loop_carry, _):
            flow_state, mimi_state, c = loop_carry
            rng_i = jax.random.fold_in(rng, c["tick"])
            flow_state, next_latent, is_eos = flow_lm.decode_step(
                flow_params,
                flow_state,
                c["latent"],
                c["is_bos"],
                rng_i,
                temp,
                lsd_decode_steps,
                noise_clamp,
                eos_threshold,
            )
            eos_step = jnp.where(is_eos, jnp.minimum(c["eos_step"], c["step"]), c["eos_step"])
            emit = (c["step"] < eos_step + c["frames_after_eos"]) & (c["step"] < c["max_gen"])

            frame, mimi_state = decode_mimi_frame(
                flow_params, mimi_params, mimi, next_latent, mimi_state
            )

            new_c = {
                "latent": next_latent,
                "is_bos": jnp.zeros_like(c["is_bos"]),
                "eos_step": eos_step,
                "step": c["step"] + 1,
                "tick": c["tick"] + 1,
                "frames_after_eos": c["frames_after_eos"],
                "max_gen": c["max_gen"],
            }
            return (flow_state, mimi_state, new_c), (frame, emit)

        (flow_state, mimi_state, carry), (audio, emit) = jax.lax.scan(
            step, (flow_state, mimi_state, carry), None, length=segment_frames,
            unroll=unroll,
        )
        steps_target = jnp.minimum(
            carry["eos_step"] + carry["frames_after_eos"] + 1, carry["max_gen"]
        )
        all_done = jnp.all(carry["step"] >= steps_target)
        audio = jnp.transpose(audio, (1, 0, 2))  # [S, B, F] -> [B, S, F]
        emit = jnp.transpose(emit, (1, 0))
        return flow_state, mimi_state, carry, audio, emit, all_done

    return fn

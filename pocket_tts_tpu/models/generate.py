"""The fused generate step: FlowLM decode + EOS bookkeeping + Mimi vocoder.

This is the hot path of the whole framework — one pure function per segment.
Everything the reference does per frame in Python with a device sync
(reference: pocket_tts_mlx/models/tts_model.py:402-428) happens here
on-device, split into the two phases that actually have different data
dependencies:

  1. `lax.scan` over S autoregressive FlowLM steps (KV append, EOS logit
     test + eos_step/frames_after_eos carry updates, noise draw,
     flow-matching ODE) — only the 32-d latent feeds back frame-to-frame.
  2. ONE bulk Mimi vocode of all S latents (denorm + 1x1 quantizer
     projection + upsample + windowed codec transformer + SEANet) — the
     vocoder is streaming but not autoregressive, so it runs at 16*S codec
     positions per dispatch where its convs/matmuls tile onto the MXU,
     instead of 16 positions per frame inside the scan.

Shared by TTSModel (single-chip serving), the multi-chip dryrun, and the
benchmark harness.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.ops.sampling import sample_noise


def decode_mimi_chunk(flow_params, mimi_params, mimi, latents, mimi_state):
    """Denormalize S FlowLM latents [B, S, ldim] and vocode them in one
    streaming chunk -> (audio [B, S, frame], new mimi state).

    Vocoding a whole segment at once (instead of per frame inside the decode
    scan) gives the codec transformer and SEANet convs 16*S positions per
    dispatch — the convs/matmuls tile onto the MXU instead of running at
    T=16 — and is numerically identical to frame-by-frame decode by the
    streaming chunk-invariance property (tests/test_mimi.py, tests/test_conv.py)."""
    B, S, _ = latents.shape
    mimi_in = jnp.transpose(
        latents * flow_params["emb_std"] + flow_params["emb_mean"], (0, 2, 1)
    )
    quantized = mimi.quantize(mimi_params, mimi_in)
    wav, mimi_state = mimi.decode_from_latent(mimi_params, quantized, mimi_state)
    return wav.reshape(B, S, wav.shape[-1] // S), mimi_state


def decode_mimi_frame(flow_params, mimi_params, mimi, latent, mimi_state):
    """Single-frame vocode [B, ldim] -> [B, frame] (warmup and the per-frame
    serving paths)."""
    audio, mimi_state = decode_mimi_chunk(
        flow_params, mimi_params, mimi, latent[:, None, :], mimi_state
    )
    return audio[:, 0, :], mimi_state


def initial_carry(flow_lm: FlowLMModel, batch: int, frames_after_eos, max_gen) -> dict:
    """Fresh decode carry for a batch: BOS flags, EOS sentinels, step counters.

    `step` is per-stream so the continuous-batching engine can admit new
    streams mid-flight; `tick` is the global frame counter used only for RNG
    folding (equal to step for whole-batch generation).

    Leaves are host (numpy) arrays: they upload once at the first jit call
    boundary instead of costing seven eager device dispatches per utterance
    (material through the relay's per-dispatch latency)."""
    import numpy as np

    return {
        "latent": np.zeros((batch, flow_lm.ldim), dtype=np.float32),
        "is_bos": np.ones((batch,), dtype=np.bool_),
        "eos_step": np.full((batch,), 2**30, dtype=np.int32),
        "step": np.zeros((batch,), dtype=np.int32),
        "tick": np.zeros((), dtype=np.int32),
        "frames_after_eos": np.asarray(frames_after_eos, dtype=np.int32),
        "max_gen": np.asarray(max_gen, dtype=np.int32),
    }


def _segment_kernel_ok(flow_lm, flow_params, flow_state, B, lsd_decode_steps) -> bool:
    """Static dispatch test for the whole-segment kernel: B=1 with every
    packed layout present (load_model packs them on TPU only), a 1-step
    Euler schedule (the packing bakes the timestep embeddings for it), and
    a capacity bucket whose KV scratch fits next to the pair weight
    double-buffer AND the flow chunk double-buffer (~4 MiB each).

    widx0 + S <= C is the CALLER's contract (data, not shape — it cannot be
    checked here): TTSModel budgets capacity for the whole dispatch
    schedule before generating. On violation the kernel clamps writes to
    the last row — the same degraded behavior the scan path's
    dynamic_update_slice clamp produces."""
    from pocket_tts_tpu.ops.fused_segment import fused_segment_enabled

    t = flow_params["transformer"]
    if not (
        B == 1
        and lsd_decode_steps == 1
        and isinstance(t, dict)
        and "fused" in t
        and "fused_head" in t
        and "fused_segment" in t
        and fused_segment_enabled()
    ):
        return False
    k = flow_state["transformer"]["layers"][0]["k"]  # [1, C, H, d] slot-major
    if k.dtype == jnp.int8:
        return False  # int8-KV cache: kernels carry no scale plumbing
    kv_bytes = 2 * k.shape[1] * k.shape[2] * k.shape[3] * k.dtype.itemsize
    from pocket_tts_tpu.ops.fused_backbone import bucket_allows

    # Probed verdict per capacity bucket when available; static threshold
    # (KV scratch next to the pair double-buffer + 4 MiB flow chunks) else.
    return bucket_allows("segment", k.shape[1], kv_bytes <= 4 * 1024 * 1024)


def _segment_kernel_call(flow_lm, flow_params, flow_state, carry, noise_seq, eos_threshold):
    """Run one segment through fused_segment_decode and mirror the scan's
    return contract: (flow_state', last_latent, latents [S, 1, ldim],
    eos_flags [S, 1])."""
    from pocket_tts_tpu.ops.fused_backbone import fused_interpret_enabled
    from pocket_tts_tpu.ops.fused_segment import (
        fused_segment_decode,
        segment_block_mode,
    )
    from pocket_tts_tpu.ops.rope import rope_angles

    t = flow_params["transformer"]
    tstate = flow_state["transformer"]
    layers = tstate["layers"]
    S = noise_seq.shape[0]
    tcfg = flow_lm.config.transformer
    positions = (
        flow_state["pos"][0] + jnp.arange(S, dtype=jnp.int32)
    )[None, :]
    cos, sin = rope_angles(
        jnp.maximum(positions, 0),
        tcfg.d_model // tcfg.num_heads,
        float(tcfg.max_period),
    )
    k0 = layers[0]["k"]  # [1, C, H, d] slot-major
    kv_bytes = 2 * k0.shape[1] * k0.shape[2] * k0.shape[3] * k0.dtype.itemsize
    latents, eos_logits, new_ks, new_vs, spnew = fused_segment_decode(
        t["fused"],
        t["fused_head"],
        t["fused_segment"],
        carry["latent"],
        jnp.asarray(carry["is_bos"]),
        noise_seq[:, 0, :],
        tuple(l["k"] for l in layers),
        tuple(l["v"] for l in layers),
        layers[0]["slot_pos"],
        flow_state["pos"].astype(jnp.int32),
        jnp.reshape(tstate["widx"], (1,)).astype(jnp.int32),
        cos[0, :, 0],
        sin[0, :, 0],
        num_heads=tcfg.num_heads,
        interpret=fused_interpret_enabled(),
        seg_frames=S,
        block=segment_block_mode(kv_bytes, capacity=k0.shape[1]),
    )
    new_layers = [
        {"k": new_ks[i][None], "v": new_vs[i][None], "slot_pos": spnew}
        for i in range(len(layers))
    ]
    new_flow_state = {
        "transformer": {"layers": new_layers, "widx": tstate["widx"] + S},
        "pos": flow_state["pos"] + S,
    }
    return (
        new_flow_state,
        latents[-1:],  # [1, ldim] — the carry latent for the next segment
        latents[:, None, :],  # [S, 1, ldim]
        (eos_logits > eos_threshold)[:, None],  # [S, 1]
    )


def make_segment_fn(
    flow_lm: FlowLMModel,
    mimi: MimiModel,
    lsd_decode_steps: int,
    noise_clamp: Optional[float],
    segment_frames: int,
    unroll: int = 1,
    emit_pcm16: bool = False,
    read_limit: Optional[int] = None,
    batch_kernel: bool = False,
):
    """Build the pure segment function.

    fn(params, flow_state, mimi_state, carry, rng, temp, eos_threshold)
      -> (flow_state, mimi_state, carry, audio [B,S,frame], emit [B,S], all_done)

    `rng` is the per-generation key; each frame folds in the absolute step
    index, so outputs are independent of how frames are grouped into segments.

    emit_pcm16 converts the audio to int16 PCM on device (inside the same
    program — no extra dispatch), halving device->host bytes per segment;
    that conversion is what a 16-bit WAV writer would apply anyway.

    read_limit (static) bounds the KV rows the XLA attention path READS per
    step — the batch decode is cache-read bound and valid rows occupy only
    the front of the capacity bucket. Caller's contract: every valid slot
    incl. this segment's appends lies below it (widx0 + S <= read_limit).
    The B=1 megakernel/segment-kernel paths ignore it.
    """

    def fn(params, flow_state, mimi_state, carry, rng, temp, eos_threshold):
        flow_params = params["flow_lm"]
        mimi_params = params["mimi"]

        # Hoist the flow-ODE starting noise for ALL S frames out of the scan:
        # one vectorized threefry draw [S, B, ldim] instead of S serial
        # fold_in+normal kernels on the per-frame critical path. Bitwise
        # identical to drawing inside the step (same fold_in(rng, tick+i)
        # then per-stream fold_in inside sample_noise).
        B = carry["latent"].shape[0]
        frame_keys = jax.vmap(lambda i: jax.random.fold_in(rng, carry["tick"] + i))(
            jnp.arange(segment_frames)
        )
        noise_seq = jax.vmap(
            lambda k: sample_noise(k, (B, flow_lm.ldim), temp, noise_clamp)
        )(frame_keys)

        # Phase 1: the autoregressive FlowLM scan. Only the latent feedback is
        # sequential; the vocoder is not, so it stays OUT of the scan body.
        # The scan carry is THIN — (flow state, latent, bos flag) — because
        # the decode step is launch-count bound (BENCHMARKS.md scan-skeleton
        # floor): EOS/emit bookkeeping runs per frame in the reference's
        # Python loop, but none of it feeds back into the latent recurrence,
        # so it vectorizes over all S frames AFTER the scan (a prefix-min
        # over the EOS flags reproduces the running eos_step exactly).
        def step(loop_carry, noise_i):
            flow_state, latent, bos = loop_carry
            flow_state, next_latent, is_eos = flow_lm.decode_step(
                flow_params,
                flow_state,
                latent,
                bos,
                rng,  # unused: noise is pre-drawn
                temp,
                lsd_decode_steps,
                noise_clamp,
                eos_threshold,
                noise=noise_i,
                read_limit=read_limit,
                batch_kernel=batch_kernel,
            )
            return (flow_state, next_latent, jnp.zeros_like(bos)), (
                next_latent,
                is_eos,
            )

        if (
            _segment_kernel_ok(flow_lm, flow_params, flow_state, B, lsd_decode_steps)
            and noise_seq.shape[0] % 8 == 0  # frame groups (fused_segment)
        ):
            # Whole-segment Mosaic kernel (ops/fused_segment.py, default
            # ON; POCKET_TTS_FUSED_SEGMENT=0 opts out):
            # ALL S frames — input proj, backbone, head, flow ODE, KV/slot
            # appends — in one program; no per-frame launches at all.
            flow_state, last_latent, latents, eos_flags = _segment_kernel_call(
                flow_lm, flow_params, flow_state, carry, noise_seq, eos_threshold
            )
        else:
            (flow_state, last_latent, _), (latents, eos_flags) = jax.lax.scan(
                step, (flow_state, carry["latent"], carry["is_bos"]), noise_seq,
                unroll=unroll,
            )

        # Vectorized EOS bookkeeping over the whole segment ([S, B] ops once
        # per segment instead of [B] ops per frame). The running eos_step at
        # frame i (AFTER folding frame i's own flag, as the per-frame loop
        # did) is the prefix-min of flagged step indices.
        steps = carry["step"][None, :] + jnp.arange(segment_frames, dtype=jnp.int32)[:, None]
        cand = jnp.where(eos_flags, steps, 2**30)
        eos_step_seq = jnp.minimum(
            carry["eos_step"][None, :], jax.lax.cummin(cand, axis=0)
        )  # [S, B]
        emit = (steps < eos_step_seq + carry["frames_after_eos"][None, :]) & (
            steps < carry["max_gen"][None, :]
        )
        carry = {
            "latent": last_latent,
            "is_bos": jnp.zeros_like(jnp.asarray(carry["is_bos"])),
            "eos_step": eos_step_seq[-1],
            "step": carry["step"] + segment_frames,
            "tick": carry["tick"] + segment_frames,
            "frames_after_eos": carry["frames_after_eos"],
            "max_gen": carry["max_gen"],
        }

        # Phase 2: vocode the whole segment in one streaming chunk (16*S codec
        # positions per dispatch instead of 16).
        latents = jnp.transpose(latents, (1, 0, 2))  # [S, B, ldim] -> [B, S, ldim]
        audio, mimi_state = decode_mimi_chunk(
            flow_params, mimi_params, mimi, latents, mimi_state
        )
        if emit_pcm16:
            audio = (jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int16)

        steps_target = jnp.minimum(
            carry["eos_step"] + carry["frames_after_eos"] + 1, carry["max_gen"]
        )
        all_done = jnp.all(carry["step"] >= steps_target)
        emit = jnp.transpose(emit, (1, 0))  # [S, B] -> [B, S]
        return flow_state, mimi_state, carry, audio, emit, all_done

    return fn

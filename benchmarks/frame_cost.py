"""Device-only per-frame cost of the fused decode segment.

Methodology (see BENCHMARKS.md): the axon relay makes enqueue-only timing
meaningless, so segments are CHAINED (each consumes the previous state) and
the clock stops only after device_get of a scalar derived from the last
segment's audio — the measured window covers real device execution.

Usage: python benchmarks/frame_cost.py [--dtype bfloat16|int8|float32]
                                       [--batch 1] [--segments 8] [--S 32]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("POCKET_TTS_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--S", type=int, default=32)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--unroll", type=int, default=4)
    args = ap.parse_args()

    from pocket_tts_tpu.models.generate import initial_carry, make_segment_fn
    from pocket_tts_tpu.models.tts_model import TTSModel, enable_compilation_cache

    enable_compilation_cache()
    model = TTSModel.load_model(
        eos_threshold=1e9, param_dtype=args.dtype, matmul_precision="default"
    )
    flow_lm, mimi = model.flow_lm, model.mimi
    B, S = args.batch, args.S

    prompt = jax.random.normal(jax.random.PRNGKey(0), (B, 125, flow_lm.dim), jnp.float32) * 0.02
    state = flow_lm.init_state(B, args.capacity, dtype=model.state_dtype)
    lengths = jnp.full((B,), 125, jnp.int32)
    flow_state = jax.jit(flow_lm.prefill)(model.params["flow_lm"], state, prompt, lengths)
    mimi_state = mimi.init_decode_state(B, kv_dtype=model.state_dtype, max_chunk_frames=S)
    carry = initial_carry(flow_lm, B, [10**6] * B, [10**6] * B)

    fn = make_segment_fn(
        flow_lm, mimi, model.lsd_decode_steps, model.noise_clamp, S, unroll=args.unroll
    )
    seg = jax.jit(fn, donate_argnums=(1, 2, 3))
    rng = jax.random.PRNGKey(1)
    temp, thr = jnp.float32(0.7), jnp.float32(1e9)

    def chain(n):
        nonlocal flow_state, mimi_state, carry
        last = None
        for _ in range(n):
            flow_state, mimi_state, carry, audio, emit, done = seg(
                model.params, flow_state, mimi_state, carry, rng, temp, thr
            )
            last = audio
        return float(jax.device_get(jnp.sum(last[:, -1, -8:])))

    chain(2)  # compile + warm
    t0 = time.monotonic()
    _ = chain(args.segments)
    wall = time.monotonic() - t0
    frames = args.segments * S
    per_frame_ms = wall * 1000 / frames
    print(
        f"dtype={args.dtype} B={B} S={S} segments={args.segments}: "
        f"{per_frame_ms:.3f} ms/frame "
        f"(device RTF ceiling ~{80.0 / per_frame_ms:.1f}x at B={B}; "
        f"aggregate ~{80.0 * B / per_frame_ms:.1f}x)"
    )


if __name__ == "__main__":
    main()

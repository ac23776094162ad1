"""Where does the single-stream wall clock go? Phase timing of one bulk
generate_audio-equivalent run (tokenize / state prep / prefill / segment
dispatches / final fetch), on whatever backend the env provides.

The fused decode itself is measured by benchmarks/frame_cost.py; this script
exposes the FIXED per-utterance overhead around it (host work, relay
round-trips, transfers) that sets the end-to-end RTF gap vs the device-only
ceiling.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("POCKET_TTS_OFFLINE", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from pocket_tts_tpu.models.tts_model import TTSModel, enable_compilation_cache

    enable_compilation_cache()
    dtype = os.environ.get("POCKET_TTS_BENCH_DTYPE", "int8")
    model = TTSModel.load_model(eos_threshold=1e9, param_dtype=dtype)
    prompt = (
        jax.random.normal(jax.random.PRNGKey(0), (1, 125, model.flow_lm.dim), jnp.float32)
        * 0.02
    )
    voice = model._state_from_prompt(prompt)
    text = (
        "The quick brown fox jumps over the lazy dog while seventy six trombones "
        "led the big parade down the long and winding road toward the harbor."
    )

    # Warm all jits.
    model.generate_audio(voice, text, frames_after_eos=2)
    model.generate_audio(voice, text, frames_after_eos=2)

    t = {}

    def mark(name, t0):
        t[name] = t.get(name, 0.0) + (time.monotonic() - t0)

    for _ in range(3):
        t0 = time.monotonic()
        frames_iter = model._generate_batch_frames(
            model_state=voice, texts=[text], frames_after_eos=[3],
            copy_state=True, warmup_frames=1, bulk=True,
        )
        # The generator does everything lazily; first next() runs prep +
        # prefill + all dispatches + the single bulk fetch.
        first = next(frames_iter)
        mark("first_yield (prep+prefill+dispatch+fetch)", t0)
        t0 = time.monotonic()
        n = 1 + sum(1 for _ in frames_iter)
        mark("drain remaining yields (host only)", t0)

    # Micro-costs of the eager host-side pieces, isolated.
    t0 = time.monotonic()
    for _ in range(10):
        model.conditioner.prepare(text)
    t["tokenize x10"] = time.monotonic() - t0

    t0 = time.monotonic()
    for _ in range(10):
        model._next_rng()
    jax.block_until_ready(model._rng)
    t["rng split x10"] = time.monotonic() - t0

    from pocket_tts_tpu.models.generate import initial_carry

    t0 = time.monotonic()
    for _ in range(10):
        c = initial_carry(model.flow_lm, 1, [3], [100])
    jax.block_until_ready(c)
    t["initial_carry x10"] = time.monotonic() - t0

    audio = model.generate_audio(voice, text, frames_after_eos=2)
    sec = audio.shape[0] / 24000
    t0 = time.monotonic()
    audio = model.generate_audio(voice, text, frames_after_eos=2)
    wall = time.monotonic() - t0
    print(f"\nbackend={jax.devices()[0].platform} dtype={dtype} frames={n}")
    for k, v in t.items():
        print(f"  {k}: {v * 1000:.1f} ms")
    print(f"  full generate_audio: {wall * 1000:.1f} ms for {sec:.2f}s audio -> {sec / wall:.1f}x")


if __name__ == "__main__":
    main()

"""Per-stream delivery deadlines under concurrent serving load.

Aggregate RTF >= N does not prove N streams never stall mid-playback; this
bench measures what a real-time client actually experiences: for every frame
of every stream, how late it arrived relative to an 80 ms-cadence player that
starts at the stream's first frame. Reported per slot count:

  - p50 / p99 / max worst-case lateness across streams
  - streams that would stall with a 0 / 1 / 3-frame client buffer

Usage: python benchmarks/deadlines.py [--slots 64] [--dtype int8]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("POCKET_TTS_OFFLINE", "1")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, nargs="*", default=[16, 64])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--capacity", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pocket_tts_tpu.models.tts_model import TTSModel, enable_compilation_cache
    from pocket_tts_tpu.serving.engine import TTSEngine

    enable_compilation_cache()
    model = TTSModel.load_model(
        eos_threshold=1e9, param_dtype=args.dtype, matmul_precision="default"
    )
    prompt = (
        jax.random.normal(jax.random.PRNGKey(0), (1, 125, model.flow_lm.dim), jnp.float32)
        * 0.02
    )
    voice = model._state_from_prompt(prompt)
    text = (
        "The quick brown fox jumps over the lazy dog while seventy six trombones "
        "led the big parade down the long and winding road toward the harbor."
    )

    for slots in args.slots:
        # One engine per slot count; the first burst warms jit tracing and
        # compilation (a server pays this once at startup), the second is
        # the measured cold burst on the warm engine.
        engine = TTSEngine(
            model, slots=slots, segment_frames=8, capacity=args.capacity,
            text_pad=64, emit_pcm16=True, warmup_frames=1,
            record_frame_times=True,
        )

        def run():
            handles = [engine.submit(text, voice, frames_after_eos=2) for _ in range(slots)]
            t0 = time.monotonic()
            engine.run(stop_when_idle=True)
            wall = time.monotonic() - t0
            return handles, wall

        run()  # warm/compile
        handles, wall = run()

        worst = np.array([engine.frame_lateness(h).max() for h in handles])
        total_sec = sum(len(h.frame_times) for h in handles) * 0.08
        stalls = lambda buf: int((worst > buf * 0.08).sum())
        print(
            f"slots={slots}: aggregate_rtf={total_sec / wall:.1f}x wall={wall:.2f}s | "
            f"worst-lateness p50={np.percentile(worst, 50) * 1000:.0f}ms "
            f"p99={np.percentile(worst, 99) * 1000:.0f}ms max={worst.max() * 1000:.0f}ms | "
            f"stalled streams (buffer 0/1/3 frames): "
            f"{stalls(0)}/{stalls(1)}/{stalls(3)} of {slots}"
        )


if __name__ == "__main__":
    main()

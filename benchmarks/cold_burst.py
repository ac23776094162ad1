"""Instrumented cold-burst admission profile for the continuous-batching
engine: where does submit -> first-frame time go for a 64-stream burst?

Phases timed (all on the engine thread, serial chain):
  submit_loop   64x submit() (sentence split + tokenize + queue put)
  admit         _admit_group (voice expansion cache + one spliced dispatch)
  prefill       one batched text prefill dispatch
  segment       the 2-frame short segment dispatch (async, returns fast)
  deliver       blocking device_get of the short segment (= device chain sync)

Run on the TPU from /root/repo:  python benchmarks/cold_burst.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from pocket_tts_tpu import TTSModel  # noqa: E402
from pocket_tts_tpu.serving.engine import TTSEngine  # noqa: E402

TEXT = (
    "The quick brown fox jumps over the lazy dog while seventy seven "
    "trombones led the big parade down by the riverside in the golden "
    "light of a long summer evening."
)
BATCH = 64


def profile_burst(engine, voice):
    t = {}
    t0 = time.monotonic()
    handles = [engine.submit(TEXT, voice, frames_after_eos=2) for _ in range(BATCH)]
    t["submit_loop"] = time.monotonic() - t0

    # Drive one tick by hand with phase clocks (mirrors run()'s first tick).
    t0 = time.monotonic()
    to_admit = []
    for b, slot in enumerate(engine._slots):
        if slot.active:
            continue
        try:
            item = engine._pending.get_nowait()
        except Exception:
            break
        handle, v, fae, max_gen, tokens = item
        to_admit.append((b, handle, v, fae, max_gen, tokens))
    t["drain_queue"] = time.monotonic() - t0

    t0 = time.monotonic()
    admitted = engine._admit_group(to_admit)
    t["admit_dispatch"] = time.monotonic() - t0

    t0 = time.monotonic()
    import jax

    jax.block_until_ready(engine.flow_state["transformer"]["widx"])
    t["admit_sync"] = time.monotonic() - t0

    t0 = time.monotonic()
    engine._prefill_admitted(admitted)
    t["prefill_dispatch"] = time.monotonic() - t0

    t0 = time.monotonic()
    jax.block_until_ready(engine.flow_state["transformer"]["widx"])
    t["prefill_sync"] = time.monotonic() - t0

    engine._just_admitted = True
    t0 = time.monotonic()
    dispatched = engine._dispatch_segment()
    t["segment_dispatch"] = time.monotonic() - t0

    t0 = time.monotonic()
    engine._deliver(dispatched)
    t["deliver_fetch"] = time.monotonic() - t0

    ttfa = [h.frame_times[0] - h.submit_time for h in handles if h.frame_times]
    t["ttfa_p50"] = float(np.median(ttfa)) if ttfa else float("nan")

    # Drain the rest so the next burst starts cold-but-warm-jit. A tick
    # that retires every slot may requeue a handle's next sentence chunk,
    # so keep stepping while anything is pending, not just while active.
    while engine.step() or not engine._pending.empty():
        pass
    for h in handles:
        h._done.wait()
    return t


def main():
    import jax
    import jax.numpy as jnp

    model = TTSModel.load_model(
        eos_threshold=1e9, param_dtype="bfloat16", transfer_pcm16=True
    )
    prompt = (
        jax.random.normal(
            jax.random.PRNGKey(0), (1, 125, model.flow_lm.dim), jnp.float32
        )
        * 0.02
    )
    voice = model._state_from_prompt(prompt)

    engine = TTSEngine(
        model, slots=BATCH, segment_frames=8, capacity=1024, text_pad=64,
        emit_pcm16=True, warmup_frames=1, record_frame_times=True,
    )
    for i in range(4):
        t = profile_burst(engine, voice)
        print(
            f"burst {i}: "
            + "  ".join(f"{k}={v * 1000:.1f}ms" for k, v in t.items())
        )


if __name__ == "__main__":
    main()

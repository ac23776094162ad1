"""Throughput sweep: aggregate RTF vs batch size (bulk API).

Usage: python benchmarks/sweep.py [batch sizes...]
Writes one line per configuration; see BENCHMARKS.md for recorded results.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("POCKET_TTS_OFFLINE", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import logging

import jax

logging.basicConfig(level=logging.WARNING)

from bench import SAMPLE_RATE, TEXT, _build_model, _make_voice  # noqa: E402


def main() -> None:
    from pocket_tts_tpu.models.tts_model import enable_compilation_cache, stack_states

    enable_compilation_cache()
    batches = [int(a) for a in sys.argv[1:]] or [1, 8, 16, 32, 64]

    dtype = os.environ.get("POCKET_TTS_BENCH_DTYPE", "bfloat16")
    model = _build_model(dtype)
    voice = _make_voice(model)

    print(f"platform={jax.devices()[0].platform} dtype={dtype} text_tokens~{len(model.tokenizer.encode(TEXT))}")

    # Device->host bandwidth probe: the bulk API ships the synthesized PCM
    # to the host, so past the batch size where compute amortizes, the WALL
    # is bounded by audio_bytes / D2H bandwidth — an environment property
    # (this build reaches the chip through a ~40 MB/s relay; a local PCIe
    # host moves the same bytes in milliseconds). The floor printed per row
    # attributes the large-batch "regression" to that bound.
    import jax.numpy as jnp
    import numpy as np

    # Random payloads, one fetch each: constant buffers and repeated fetches
    # of the same buffer can both be shortcut by the transport.
    probes = [
        jax.random.randint(
            jax.random.PRNGKey(i), (16 * 1024 * 1024 // 2,), -1000, 1000, jnp.int16
        )
        for i in range(3)
    ]
    jax.device_get(jnp.sum(probes[-1]))  # materialize all before timing
    bws = []
    for probe in probes:
        t0 = time.monotonic()
        np.asarray(probe)
        bws.append(probe.nbytes / (time.monotonic() - t0))
    d2h = max(bws)
    print(f"d2h_bandwidth={d2h / 1e6:.1f} MB/s (16 MiB probes)")

    for batch in batches:
        stacked = stack_states(model.flow_lm, [voice] * batch) if batch > 1 else voice
        texts = [TEXT] * batch
        _ = model.generate_audio_batch(stacked, texts, frames_after_eos=2)  # compile/warm
        t0 = time.monotonic()
        outs = model.generate_audio_batch(stacked, texts, frames_after_eos=2)
        wall = time.monotonic() - t0
        total_sec = sum(o.shape[0] for o in outs) / SAMPLE_RATE
        # PCM16 transfer floor for this batch's audio through the measured link.
        audio_bytes = sum(o.shape[0] for o in outs) * 2
        floor = audio_bytes / d2h
        print(
            f"batch={batch:3d}  aggregate_rtf={total_sec / wall:7.1f}x  "
            f"per_stream={total_sec / wall / batch:6.2f}x  wall={wall:.2f}s  "
            f"transfer_floor={floor:.2f}s ({100 * floor / wall:.0f}% of wall)",
            flush=True,
        )


if __name__ == "__main__":
    main()

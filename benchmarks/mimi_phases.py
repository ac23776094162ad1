"""Mimi vocoder sub-phase costs at the batch serving shape.

Times the three decode sub-phases separately (chained device calls, clock
stopped by a device_get on a probe scalar, same protocol as frame_cost.py):

  - quantize:    1x1 conv [B, 32, T] -> [B, 512, T]
  - transformer: upsample + codec transformer (banded ring attention)
  - seanet:      SEANet decoder chain (convs/convtrs, bf16 activations
                 with the f32 waveform island)

Usage: python benchmarks/mimi_phases.py [--batch 64] [--S 32] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("POCKET_TTS_OFFLINE", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def chain_ms_per_frame(fn, state, n_segments, S, probe):
    out = state
    for _ in range(2):
        out = fn(out)
    _ = float(jax.device_get(probe(out)))
    t0 = time.monotonic()
    for _ in range(n_segments):
        out = fn(out)
    _ = float(jax.device_get(probe(out)))
    return (time.monotonic() - t0) * 1000.0 / (n_segments * S)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--S", type=int, default=32)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from pocket_tts_tpu.models.tts_model import TTSModel

    model = TTSModel.load_model(param_dtype=args.dtype)
    mimi, params = model.mimi, model.params["mimi"]
    B, S = args.batch, args.S
    # Latents enter at the 12.5 Hz frame rate (T=S); the upsampler emits the
    # 16x longer 200 Hz codec sequence the transformer and SEANet consume.
    rng = np.random.default_rng(5)
    lat32 = jnp.asarray(rng.standard_normal((B, 32, S)), jnp.float32)

    mst0 = mimi.init_decode_state(B, kv_dtype=model.state_dtype, max_chunk_frames=S)
    emb0 = mimi.quantize(params, lat32)

    @jax.jit
    def f_quantize(lat):
        out = mimi.quantize(params, lat)
        # feedback keeps the chain serial without growing shapes
        return lat + out[:, :32, :].astype(lat.dtype) * 1e-6

    @jax.jit
    def f_transformer(carry):
        emb, st = carry
        new_state = dict(st)
        wdt = params["decoder"]["model"][0]["conv"]["weight"].dtype
        e = emb.astype(wdt)
        if mimi.has_resample:
            e, new_state["upsample"] = mimi.upsample(
                params["upsample"]["convtr"]["convtr"], e, st["upsample"]
            )
        positions = st["pos"][:, None] + jnp.arange(e.shape[-1], dtype=jnp.int32)[None, :]
        (e,), new_state["decoder_transformer"] = mimi.decoder_transformer(
            params["decoder_transformer"], e, st["decoder_transformer"], positions
        )
        new_state["pos"] = st["pos"] + e.shape[-1]
        fb = e[:, : emb.shape[1], : emb.shape[-1]].astype(emb.dtype)
        return emb + fb * 1e-6, new_state

    # transformer output length (after upsample) drives the decoder input
    up_e, _ = (
        mimi.upsample(params["upsample"]["convtr"]["convtr"], emb0, mst0["upsample"])
        if mimi.has_resample
        else (emb0, None)
    )

    @jax.jit
    def f_seanet(carry):
        e, st = carry
        wav, new_dec = mimi.decoder(params["decoder"], e, st)
        return e + wav[:, :, : e.shape[-1]].astype(e.dtype) * 1e-6, new_dec

    runs = [
        ("quantize", f_quantize, lat32, lambda o: o[0, 0, 0]),
        ("transformer", f_transformer, (emb0, mst0), lambda o: o[0][0, 0, 0]),
        (
            "seanet",
            f_seanet,
            (up_e.astype(params["decoder"]["model"][0]["conv"]["weight"].dtype), mst0["decoder"]),
            lambda o: o[0][0, 0, 0],
        ),
    ]
    for name, fn, st, probe in runs:
        best = min(
            chain_ms_per_frame(fn, st, args.segments, S, probe)
            for _ in range(args.repeats)
        )
        print(f"{name:12s} {best:.3f} ms/frame (best of {args.repeats}, B={B}, S={S})")


if __name__ == "__main__":
    main()

"""Does XLA overlap the read-bound backbone with the MXU-bound vocoder?

Motivation (r5): at B=64 the segment phases are exactly additive — full
2.29 ≈ nomimi 1.41 + mimi-marginal 0.88 ms/frame-step (ablate.py) — because
the vocoder consumes THIS segment's latents, so it cannot start until the
scan finishes. But the two phases want different hardware: the backbone
streams KV/weights at the HBM read ceiling with the MXU mostly idle, while
the SEANet/codec chain is MXU-heavy and byte-light. A software pipeline
(decode segment k's backbone in the same program as segment k-1's vocoder)
removes the data dependence; this probe measures whether XLA's scheduler
then actually hides one under the other.

Variants (chained, feedback-serialized, enqueue-to-device_get):
  backbone : segment scan only (vocoder stubbed)
  mimi     : vocoder only on a held latent block
  pipeline : one program = scan(segment k) + vocoder(latents k-1), no
             data edge between them; latents k feed the NEXT call
  serial   : same computation as pipeline but with a fake data edge
             (vocoder input += 0 * h_last) forcing scan -> vocoder order

pipeline ~= serial      -> XLA does not overlap; a pipelined production
                           path buys nothing (negative result).
pipeline ~= max(parts)  -> full overlap; wire it into the batch scheduler.

Usage: python benchmarks/overlap_probe.py [--batch 64] [--S 32]
       [--capacity 512] [--read-limit 256] [--dtype int8] [--kv int8]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--kv", default="int8", choices=("", "int8"))
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--S", type=int, default=32)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--read-limit", type=int, default=256)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--unroll", type=int, default=4)
    args = ap.parse_args()

    from pocket_tts_tpu.models.generate import decode_mimi_chunk, initial_carry
    from pocket_tts_tpu.models.tts_model import TTSModel, enable_compilation_cache
    from pocket_tts_tpu.ops.linear import linear
    from pocket_tts_tpu.ops.norms import layer_norm
    from pocket_tts_tpu.ops.sampling import lsd_decode, sample_noise

    enable_compilation_cache()
    model = TTSModel.load_model(
        eos_threshold=1e9, param_dtype=args.dtype, matmul_precision="default"
    )
    flow_lm, mimi = model.flow_lm, model.mimi
    kv_dt = jnp.int8 if args.kv == "int8" else model.state_dtype
    B, S = args.batch, args.S
    params = model.params
    transformer, flow_net = flow_lm.transformer, flow_lm.flow_net
    read_limit = args.read_limit or None

    def scan_segment(fp, flow_state, carry, rng, temp):
        """The backbone+flow scan of one segment (production thin carry)."""
        B0 = carry["latent"].shape[0]
        frame_keys = jax.vmap(lambda i: jax.random.fold_in(rng, carry["tick"] + i))(
            jnp.arange(S)
        )
        noise_seq = jax.vmap(
            lambda k: sample_noise(k, (B0, flow_lm.ldim), temp, None)
        )(frame_keys)

        def step(loop_carry, noise):
            st, latent, bos = loop_carry
            seq = jnp.where(
                bos[:, None], fp["bos_emb"][None, :].astype(latent.dtype), latent
            )
            x = linear(seq[:, None, :], fp["input_linear"]["weight"])
            h, tstate = transformer(
                fp["transformer"], x, st["transformer"], st["pos"][:, None],
                read_limit=read_limit,
            )
            h = layer_norm(
                h, fp["out_norm"]["weight"], fp["out_norm"]["bias"], eps=1e-5
            ).astype(jnp.float32)[:, -1]
            nxt = lsd_decode(
                lambda s, t, xc: flow_net(fp["flow_net"], h, s, t, xc), noise, 1
            )
            new_st = {"transformer": tstate, "pos": st["pos"] + 1}
            return (new_st, nxt, jnp.zeros_like(bos)), nxt

        (flow_state, last_latent, _), latents = jax.lax.scan(
            step, (flow_state, carry["latent"], carry["is_bos"]), noise_seq,
            unroll=args.unroll,
        )
        carry = {**carry, "latent": last_latent,
                 "is_bos": jnp.zeros_like(jnp.asarray(carry["is_bos"])),
                 "step": carry["step"] + S, "tick": carry["tick"] + S}
        return flow_state, carry, jnp.transpose(latents, (1, 0, 2))  # [B, S, ld]

    def make(variant):
        def fn(params, flow_state, mimi_state, carry, prev_latents, rng, temp):
            fp = params["flow_lm"]
            if variant == "mimi":
                audio, mimi_state = decode_mimi_chunk(
                    fp, params["mimi"], mimi, prev_latents, mimi_state
                )
                return flow_state, mimi_state, carry, prev_latents, audio
            flow_state, carry, latents = scan_segment(fp, flow_state, carry, rng, temp)
            if variant == "backbone":
                audio = jnp.zeros((B, S, mimi.frame_size), jnp.float32) + latents.sum() * 0
                return flow_state, mimi_state, carry, latents, audio
            vin = prev_latents
            if variant == "serial":
                # Fake data edge: forces the vocoder to schedule after the
                # scan (the unpipelined production order) while computing
                # the same values.
                vin = vin + 0.0 * carry["latent"][:, None, :]
            audio, mimi_state = decode_mimi_chunk(fp, params["mimi"], mimi, vin, mimi_state)
            return flow_state, mimi_state, carry, latents, audio

        return jax.jit(fn, donate_argnums=(1, 2, 3, 4))

    prompt = jax.random.normal(jax.random.PRNGKey(0), (B, 125, flow_lm.dim), jnp.float32) * 0.02
    lengths = jnp.full((B,), 125, jnp.int32)
    rng = jax.random.PRNGKey(1)
    temp = jnp.float32(0.7)

    for variant in ("backbone", "mimi", "serial", "pipeline"):
        fn = make(variant)
        state0 = flow_lm.init_state(B, args.capacity, dtype=kv_dt)
        flow_state = jax.jit(flow_lm.prefill)(params["flow_lm"], state0, prompt, lengths)
        mimi_state = mimi.init_decode_state(B, kv_dtype=model.state_dtype, max_chunk_frames=S)
        carry = initial_carry(flow_lm, B, [10**6] * B, [10**6] * B)
        prev = jnp.zeros((B, S, flow_lm.ldim), jnp.float32)

        def chain(n):
            nonlocal flow_state, mimi_state, carry, prev
            last = None
            for _ in range(n):
                flow_state, mimi_state, carry, prev, audio = fn(
                    params, flow_state, mimi_state, carry, prev, rng, temp
                )
                last = audio
            return float(jax.device_get(jnp.sum(last[:, -1, -8:])))

        chain(2)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.monotonic()
            chain(args.segments)
            best = min(best, time.monotonic() - t0)
        ms = best * 1000 / args.segments
        print(f"{variant:9s}: {ms:8.3f} ms/segment ({ms / S:.3f} ms/frame-step)", flush=True)


if __name__ == "__main__":
    main()

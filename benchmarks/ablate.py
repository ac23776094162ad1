"""Marginal per-frame cost of each decode-step phase, measured by ablation.

step_breakdown.py measures each phase standalone, but standalone scans fuse
and donate differently from the production program, so the parts can sum to
more than the whole. Here each variant IS the production segment with one
phase stubbed out; (full - ablated) is the marginal cost of that phase in
context:

  - noflow: lsd_decode replaced by the raw noise draw (flow head skipped)
  - nomimi: vocoder skipped (audio = zeros); scan + backbone + flow remain
  - nobackbone: transformer step replaced by a cheap projection of the
    latent (KV caches untouched); flow head runs on that fake hidden state

Usage: python benchmarks/ablate.py [--dtype int8] [--S 32]
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


def build_segment(flow_lm, mimi, lsd_steps, noise_clamp, S, unroll, ablate, read_limit=None, batch_kernel=False):
    from pocket_tts_tpu.models.generate import decode_mimi_chunk
    from pocket_tts_tpu.ops.linear import linear
    from pocket_tts_tpu.ops.norms import layer_norm
    from pocket_tts_tpu.ops.sampling import lsd_decode, sample_noise

    transformer = flow_lm.transformer
    flow_net = flow_lm.flow_net

    def fn(params, flow_state, mimi_state, carry, rng, temp, eos_threshold):
        stubs = {"skeleton": {"noflow", "nomimi", "nobackbone"}}.get(ablate, {ablate})
        fp = params["flow_lm"]

        # Mirror production (models/generate.py): noise for all S frames is
        # pre-drawn in one vectorized op and fed through scan xs.
        B0 = carry["latent"].shape[0]
        frame_keys = jax.vmap(lambda i: jax.random.fold_in(rng, carry["tick"] + i))(
            jnp.arange(S)
        )
        noise_seq = jax.vmap(
            lambda k: sample_noise(k, (B0, flow_lm.ldim), temp, noise_clamp)
        )(frame_keys)

        # Mirror the production THIN carry (models/generate.py): the scan
        # threads only (state, latent, bos); step/tick bookkeeping moved out
        # of the per-frame loop there, so it must not be measured here.
        def step(loop_carry, noise):
            st, latent, bos = loop_carry
            seq = jnp.where(
                bos[:, None], fp["bos_emb"][None, :].astype(latent.dtype), latent
            )
            if "nobackbone" in stubs:
                h = jnp.tanh(linear(seq, fp["input_linear"]["weight"])).astype(jnp.float32)
                tstate = st["transformer"]
            else:
                x = linear(seq[:, None, :], fp["input_linear"]["weight"])
                h, tstate = transformer(
                    fp["transformer"], x, st["transformer"], st["pos"][:, None],
                    read_limit=read_limit, batch_kernel=batch_kernel,
                )
                h = layer_norm(
                    h, fp["out_norm"]["weight"], fp["out_norm"]["bias"], eps=1e-5
                ).astype(jnp.float32)[:, -1]
            if "noflow" in stubs:
                nxt = noise + h[:, : flow_lm.ldim] * 1e-6  # keep h live
            else:
                nxt = lsd_decode(lambda s, t, xc: flow_net(fp["flow_net"], h, s, t, xc),
                                 noise, lsd_steps)
            new_st = {"transformer": tstate, "pos": st["pos"] + 1}
            return (new_st, nxt, jnp.zeros_like(bos)), nxt

        (flow_state, last_latent, _), latents = jax.lax.scan(
            step, (flow_state, carry["latent"], carry["is_bos"]), noise_seq,
            unroll=unroll,
        )
        carry = {**carry, "latent": last_latent,
                 "is_bos": jnp.zeros_like(jnp.asarray(carry["is_bos"])),
                 "step": carry["step"] + S, "tick": carry["tick"] + S}
        latents = jnp.transpose(latents, (1, 0, 2))
        if "nomimi" in stubs:
            audio = jnp.zeros(
                (latents.shape[0], S, mimi.frame_size), jnp.float32
            ) + latents.sum() * 0
        else:
            audio, mimi_state = decode_mimi_chunk(
                fp, params["mimi"], mimi, latents, mimi_state
            )
        return flow_state, mimi_state, carry, audio

    return fn


def _timed(chain, segments) -> float:
    t0 = time.monotonic()
    chain(segments)
    return time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--S", type=int, default=32)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--read-limit", type=int, default=0,
        help="KV rows the attention READS (0 = full capacity); the chain "
        "keeps total frames under it so outputs stay valid",
    )
    ap.add_argument(
        "--batch-attn", action="store_true",
        help="dispatch the Pallas batched decode-attention kernel "
        "(ops/batch_attention.py) instead of the XLA dot_general form",
    )
    ap.add_argument(
        "--kv", default="", choices=("", "int8"),
        help="int8 = quantized FlowLM KV cache (per-row scales); halves the "
        "cache-read bytes of the read-bound batch decode",
    )
    args = ap.parse_args()

    from pocket_tts_tpu.models.generate import initial_carry
    from pocket_tts_tpu.models.tts_model import TTSModel, enable_compilation_cache

    enable_compilation_cache()
    model = TTSModel.load_model(
        eos_threshold=1e9, param_dtype=args.dtype, matmul_precision="default"
    )
    flow_lm, mimi = model.flow_lm, model.mimi
    kv_dt = jnp.int8 if args.kv == "int8" else model.state_dtype
    B, S = args.batch, args.S
    params = model.params
    prompt = jax.random.normal(jax.random.PRNGKey(0), (B, 125, flow_lm.dim), jnp.float32) * 0.02
    lengths = jnp.full((B,), 125, jnp.int32)
    rng = jax.random.PRNGKey(1)
    temp, thr = jnp.float32(0.7), jnp.float32(1e9)

    results = {}
    for ablate in (None, "noflow", "nomimi", "nobackbone", "skeleton"):
        fn = jax.jit(
            build_segment(flow_lm, mimi, model.lsd_decode_steps, model.noise_clamp,
                          S, args.unroll, ablate, read_limit=args.read_limit or None,
                          batch_kernel=args.batch_attn),
            donate_argnums=(1, 2, 3),
        )
        state0 = flow_lm.init_state(B, args.capacity, dtype=kv_dt)
        flow_state = jax.jit(flow_lm.prefill)(params["flow_lm"], state0, prompt, lengths)
        mimi_state = mimi.init_decode_state(B, kv_dtype=model.state_dtype, max_chunk_frames=S)
        carry = initial_carry(flow_lm, B, [10**6] * B, [10**6] * B)

        def chain(n):
            nonlocal flow_state, mimi_state, carry
            last = None
            for _ in range(n):
                flow_state, mimi_state, carry, audio = fn(
                    params, flow_state, mimi_state, carry, rng, temp, thr
                )
                last = audio
            return float(jax.device_get(jnp.sum(last[:, -1, -8:])))

        chain(2)
        # Repeat and take the min: the relay adds one-sided heavy-tailed
        # latency noise big enough to flip marginal signs on single chains.
        best = min(
            _timed(chain, args.segments) for _ in range(args.repeats)
        )
        ms = best * 1000 / (args.segments * S)
        results[ablate or "full"] = ms
        print(f"{ablate or 'full':12s} {ms:.3f} ms/frame (best of {args.repeats})",
              flush=True)

    full = results["full"]
    print(
        f"marginal (ms/frame): flow={full - results['noflow']:.3f} "
        f"mimi={full - results['nomimi']:.3f} "
        f"backbone={full - results['nobackbone']:.3f}"
    )
    print(
        f"scan-skeleton floor (backbone+flow+vocoder all stubbed): "
        f"{results['skeleton']:.3f} ms/frame"
    )

    # Apples-to-apples A/B of the PRODUCTION segment fn (models/generate.py):
    # per-frame scan (with whatever kernels dispatch) vs the whole-segment
    # kernel — same harness, same chain methodology. Only runs where the
    # packed layouts exist (int8 on TPU) and the capacity bucket qualifies.
    t = params["flow_lm"]["transformer"]
    if isinstance(t, dict) and "fused_segment" in t and B == 1:
        from pocket_tts_tpu.models.generate import make_segment_fn

        for tag, env in (("prod-scan", "0"), ("prod-segment", "1")):
            os.environ["POCKET_TTS_FUSED_SEGMENT"] = env
            fn = jax.jit(
                make_segment_fn(flow_lm, mimi, model.lsd_decode_steps,
                                model.noise_clamp, S, args.unroll),
                donate_argnums=(1, 2, 3),
            )
            state0 = flow_lm.init_state(B, args.capacity, dtype=kv_dt)
            flow_state = jax.jit(flow_lm.prefill)(
                params["flow_lm"], state0, prompt, lengths
            )
            mimi_state = mimi.init_decode_state(
                B, kv_dtype=model.state_dtype, max_chunk_frames=S
            )
            carry = initial_carry(flow_lm, B, [10**6] * B, [10**6] * B)

            def chain(n):
                nonlocal flow_state, mimi_state, carry
                last = None
                for _ in range(n):
                    flow_state, mimi_state, carry, audio, _emit, _done = fn(
                        params, flow_state, mimi_state, carry, rng, temp, thr
                    )
                    last = audio
                return float(jax.device_get(jnp.sum(last[:, -1, -8:])))

            try:
                chain(2)
            except Exception as e:  # noqa: BLE001 — A/B variant must not kill the sweep
                print(f"{tag:12s} failed to compile/run on this backend: "
                      f"{str(e).splitlines()[0][:160]}", flush=True)
                continue
            best = min(_timed(chain, args.segments) for _ in range(args.repeats))
            ms = best * 1000 / (args.segments * S)
            print(f"{tag:12s} {ms:.3f} ms/frame (best of {args.repeats})", flush=True)


if __name__ == "__main__":
    main()

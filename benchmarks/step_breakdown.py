"""Decode-step cost breakdown: backbone vs flow head vs Mimi vs overhead.

Each component is measured the same way as frame_cost.py (chained segments,
clock stops after a device_get derived from the last output), so the numbers
decompose the fused step's per-frame cost:

  - backbone: S-step scan of the FlowLM transformer step (qkv/attn/FF + KV
    append + out_norm + eos), feeding the hidden state back as a dummy latent
  - flow:     S-step scan of the flow-matching head alone (noise draw +
              lsd_decode at the configured step count) on a fixed hidden
  - mimi:     bulk vocode of S latents (the segment's phase 2)
  - full:     the production fused segment (frame_cost.py equivalent)

Usage: python benchmarks/step_breakdown.py [--dtype int8] [--S 32]
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


def chain_ms_per_frame(fn, state, n_segments, S, probe):
    """Run fn n_segments times, chaining state; returns ms per frame."""
    out = state
    for _ in range(2):  # compile + warm
        out = fn(out)
    _ = float(jax.device_get(probe(out)))
    t0 = time.monotonic()
    for _ in range(n_segments):
        out = fn(out)
    _ = float(jax.device_get(probe(out)))
    return (time.monotonic() - t0) * 1000 / (n_segments * S)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--S", type=int, default=32)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--unroll", type=int, default=4)
    args = ap.parse_args()

    from pocket_tts_tpu.models.generate import initial_carry, make_segment_fn
    from pocket_tts_tpu.models.tts_model import TTSModel, enable_compilation_cache
    from pocket_tts_tpu.ops.sampling import lsd_decode, sample_noise

    enable_compilation_cache()
    model = TTSModel.load_model(
        eos_threshold=1e9, param_dtype=args.dtype, matmul_precision="default"
    )
    flow_lm, mimi = model.flow_lm, model.mimi
    B, S = args.batch, args.S
    params = model.params

    prompt = jax.random.normal(jax.random.PRNGKey(0), (B, 125, flow_lm.dim), jnp.float32) * 0.02
    state0 = flow_lm.init_state(B, args.capacity, dtype=model.state_dtype)
    lengths = jnp.full((B,), 125, jnp.int32)
    flow_state0 = jax.jit(flow_lm.prefill)(params["flow_lm"], state0, prompt, lengths)
    rng = jax.random.PRNGKey(1)

    # ---------------- backbone-only scan ----------------
    transformer = flow_lm.transformer

    @jax.jit
    def backbone_seg(carry):
        fp = params["flow_lm"]

        def step(c, _):
            st, latent = c
            seq = jnp.asarray(latent)
            from pocket_tts_tpu.ops.linear import linear
            from pocket_tts_tpu.ops.norms import layer_norm

            x = linear(seq[:, None, :], fp["input_linear"]["weight"])
            h, tstate = transformer(fp["transformer"], x, st["transformer"], st["pos"][:, None])
            h = layer_norm(h, fp["out_norm"]["weight"], fp["out_norm"]["bias"], eps=1e-5)
            h = h[:, -1].astype(jnp.float32)
            eos = linear(h, fp["out_eos"]["weight"], fp["out_eos"]["bias"])[:, 0]
            new_latent = h[:, : flow_lm.ldim] * 1e-3 + eos[:, None] * 0  # feed back
            return ({"transformer": tstate, "pos": st["pos"] + 1}, new_latent), None

        (st, latent), _ = jax.lax.scan(
            step, carry, None, length=S, unroll=args.unroll
        )
        return (st, latent)

    carry0 = (flow_state0, jnp.zeros((B, flow_lm.ldim), jnp.float32))
    backbone_ms = chain_ms_per_frame(
        backbone_seg, carry0, args.segments, S, lambda c: jnp.sum(c[1])
    )

    # ---------------- flow-head-only scan ----------------
    flow_net = flow_lm.flow_net
    h_fixed = jax.random.normal(jax.random.PRNGKey(2), (B, flow_lm.dim), jnp.float32)

    @jax.jit
    def flow_seg(x):
        fp = params["flow_lm"]

        def step(x_cur, i):
            noise = sample_noise(jax.random.fold_in(rng, i), (B, flow_lm.ldim), 0.7, None)

            def v_t(s, t, xc):
                return flow_net(fp["flow_net"], h_fixed + x_cur.sum() * 0, s, t, xc)

            nxt = lsd_decode(v_t, noise, model.lsd_decode_steps)
            return nxt, None

        x, _ = jax.lax.scan(step, x, jnp.arange(S), unroll=args.unroll)
        return x

    flow_ms = chain_ms_per_frame(
        flow_seg, jnp.zeros((B, flow_lm.ldim), jnp.float32), args.segments, S,
        lambda x: jnp.sum(x),
    )

    # ---------------- mimi bulk vocode ----------------
    from pocket_tts_tpu.models.generate import decode_mimi_chunk

    mimi_state0 = mimi.init_decode_state(B, kv_dtype=model.state_dtype, max_chunk_frames=S)
    latents = jax.random.normal(jax.random.PRNGKey(3), (B, S, flow_lm.ldim), jnp.float32)

    @jax.jit
    def mimi_seg(mst):
        wav, mst = decode_mimi_chunk(params["flow_lm"], params["mimi"], mimi, latents, mst)
        return (mst, wav)

    mimi_ms = chain_ms_per_frame(
        lambda c: mimi_seg(c[0]), (mimi_state0, None), args.segments, S,
        lambda c: jnp.sum(c[1][:, -1, -8:]),
    )

    # ---------------- full fused segment ----------------
    seg_fn = jax.jit(
        make_segment_fn(flow_lm, mimi, model.lsd_decode_steps, model.noise_clamp, S,
                        unroll=args.unroll),
        donate_argnums=(1, 2, 3),
    )
    full_state = jax.jit(flow_lm.prefill)(params["flow_lm"], state0, prompt, lengths)
    full_mimi = mimi.init_decode_state(B, kv_dtype=model.state_dtype, max_chunk_frames=S)
    full_carry = initial_carry(flow_lm, B, [10**6] * B, [10**6] * B)
    temp, thr = jnp.float32(0.7), jnp.float32(1e9)

    def full_seg(c):
        fs, ms, cr = c
        fs, ms, cr, audio, emit, done = seg_fn(params, fs, ms, cr, rng, temp, thr)
        return (fs, ms, cr, audio)

    full_ms = chain_ms_per_frame(
        lambda c: full_seg(c[:3]), (full_state, full_mimi, full_carry, None),
        args.segments, S, lambda c: jnp.sum(c[3][:, -1, -8:]),
    )

    print(
        f"dtype={args.dtype} B={B} S={S} (ms/frame): "
        f"backbone={backbone_ms:.3f} flow={flow_ms:.3f} mimi={mimi_ms:.3f} "
        f"sum={backbone_ms + flow_ms + mimi_ms:.3f} full={full_ms:.3f}"
    )


if __name__ == "__main__":
    main()

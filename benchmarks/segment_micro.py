"""Standalone timing for the whole-segment kernel (ops/fused_segment.py):
per-frame microseconds for ONE fused_segment_decode call covering S frames,
next to the per-frame head-folded kernel looped S times (the production
scan's kernel, without the scan's own overhead — so the DELTA here isolates
what the segment kernel saves in launch/flow-head cost, while bench.py
with POCKET_TTS_FUSED_SEGMENT=1 measures the end-to-end effect).

Same caveat as kernel_micro.py: absolute numbers through the relay read
high; use for RELATIVE comparisons. benchmarks/ablate.py + bench.py are
the authority for in-context cost.

Usage: python benchmarks/segment_micro.py [--capacity 512] [--S 32]
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
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--S", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--interpret", action="store_true", help="CPU smoke run")
    ap.add_argument(
        "--residue", action="store_true",
        help="kernel-residue decomposition (VERDICT r4 item 4): same bytes "
        "at pair/tri/quad grid densities (42/24/18 steps per frame) fits the "
        "per-grid-step fixed cost; VPU-op stubs (norm/rope/gelu/softmax, "
        "same methodology as attn=skip) itemize the between-matmul work",
    )
    args = ap.parse_args()

    from pocket_tts_tpu.config.schema import FlowLMConfig
    from pocket_tts_tpu.models.flow_lm import FlowLMModel
    from pocket_tts_tpu.models.tts_model import enable_compilation_cache
    from pocket_tts_tpu.models.weights import quantize_int8
    from pocket_tts_tpu.ops.fused_backbone import (
        fused_backbone_step,
        pack_backbone_head,
        pack_backbone_int8,
    )
    from pocket_tts_tpu.ops.fused_segment import fused_segment_decode, pack_flow_bf16
    from pocket_tts_tpu.ops.rope import rope_angles

    enable_compilation_cache()
    E, H, L, C, S = 1024, 16, 6, args.capacity, args.S
    cfg = FlowLMConfig(
        dtype="float32",
        flow={"depth": 6, "dim": 512},
        transformer={
            "d_model": E, "hidden_scale": 4, "max_period": 10000,
            "num_heads": H, "num_layers": L,
        },
        lookup_table={
            "dim": E, "n_bins": 100, "tokenizer": "sentencepiece",
            "tokenizer_path": "unavailable://",
        },
    )
    flow_lm = FlowLMModel(config=cfg, latent_dim=32)
    params = flow_lm.init_params(jax.random.PRNGKey(0))
    q = quantize_int8({"flow_lm": params}, subtrees=("transformer",))["flow_lm"]
    packed = pack_backbone_int8(q["transformer"]["layers"])
    head_packed = pack_backbone_head(q)
    flow_packed = pack_flow_bf16(q["flow_net"])

    ks = tuple(
        jax.device_put(
            jax.random.normal(jax.random.PRNGKey(10 + i), (1, C, H, 64)).astype(jnp.bfloat16)
        )
        for i in range(L)
    )
    vs = tuple(
        jax.device_put(
            jax.random.normal(jax.random.PRNGKey(20 + i), (1, C, H, 64)).astype(jnp.bfloat16)
        )
        for i in range(L)
    )
    # History fills the first half; the segment appends after it.
    slot_pos = jnp.where(
        jnp.arange(C) < C // 2, jnp.arange(C, dtype=jnp.int32), -1
    )[None, :]
    pos0, widx0 = C // 2, C // 2
    assert widx0 + S <= C
    noise = jax.random.normal(jax.random.PRNGKey(3), (S, 32), jnp.float32) * 0.6
    latent0 = jax.random.normal(jax.random.PRNGKey(4), (1, 32), jnp.float32)
    positions = (pos0 + jnp.arange(S, dtype=jnp.int32))[None, :]
    cos_s, sin_s = rope_angles(positions, E // H)
    is_bos = jnp.zeros((1,), jnp.bool_)

    from pocket_tts_tpu.ops.fused_segment import segment_block_candidates

    # Same static preference production resolves (tri at C<=512, else pair).
    seg_block = segment_block_candidates(2 * C * E * 2)[0]

    @jax.jit
    def seg_call(lat):
        lats, eos, _, _, _ = fused_segment_decode(
            packed, head_packed, flow_packed, lat, is_bos, noise,
            ks, vs, slot_pos,
            jnp.full((1,), pos0, jnp.int32), jnp.full((1,), widx0, jnp.int32),
            cos_s[0, :, 0], sin_s[0, :, 0],
            num_heads=H, seg_frames=S, interpret=args.interpret,
            block=seg_block,
        )
        return jnp.tanh(lats[-1:])  # feedback keeps the chain serial

    cos1, sin1 = rope_angles(jnp.full((1, 1), pos0, jnp.int32), E // H)
    qpos1 = jnp.array([pos0], jnp.int32)

    def make_frame_chain(attn_mode, int8_act=False, block=None, stub=""):
        frame_block = block or ("quad" if C <= 512 else "pair")

        @jax.jit
        def frame_chain(lat):
            # S per-frame head-folded kernel calls (no flow head — this is
            # the kernel-launch floor the segment kernel removes).
            # attn_mode="skip" stubs the attention inner loop: the delta vs
            # "vpu" is the in-kernel attention phase cost per frame.
            # int8_act=True removes the int8->bf16 weight upcast (the MXU
            # consumes the int8 chunks directly).
            def body(_, l):
                h, eos, _, _, _ = fused_backbone_step(
                    packed, head_packed, l, is_bos, ks, vs, slot_pos,
                    qpos1, cos1[0, 0, 0], sin1[0, 0, 0], qpos1,
                    num_heads=H, attn_mode=attn_mode, interpret=args.interpret,
                    int8_act=int8_act,
                    block=frame_block,
                    stub=stub,
                )
                return jnp.tanh(h[:, :32])

            return jax.lax.fori_loop(0, S, body, lat)

        return frame_chain

    variants = [
        ("segment-kernel", seg_call),
        ("frame-kernel x S", make_frame_chain("vpu")),
        ("frame attn=skip", make_frame_chain("skip")),
        ("frame attn=mxu", make_frame_chain("mxu")),
        ("frame int8_act", make_frame_chain("vpu", int8_act=True)),
        ("frame i8act+skip", make_frame_chain("skip", int8_act=True)),
    ]
    if args.residue:
        variants = [
            ("frame-kernel x S", make_frame_chain("vpu")),
            # Same weight bytes at three grid densities: quad = 3 phases/
            # layer (18 steps/frame), tri = 4 (24), pair = 7 (42). The slope
            # of µs/frame over steps/frame is the per-grid-step fixed cost
            # (semaphores, phase dispatch, DMA bookkeeping).
            ("grid quad (18st)", make_frame_chain("vpu", block="quad")),
            ("grid tri  (24st)", make_frame_chain("vpu", block="tri")),
            ("grid pair (42st)", make_frame_chain("vpu", block="pair")),
            # VPU-op stubs, one at a time (marginal = full - stubbed), then
            # all together (how much of the residue is VPU work at all).
            ("stub norm", make_frame_chain("vpu", stub="norm")),
            ("stub rope", make_frame_chain("vpu", stub="rope")),
            ("stub gelu", make_frame_chain("vpu", stub="gelu")),
            ("stub softmax", make_frame_chain("vpu", stub="softmax")),
            ("stub all-vpu", make_frame_chain("vpu", stub="norm,rope,gelu,softmax")),
            ("stub all+skip", make_frame_chain("skip", stub="norm,rope,gelu,softmax")),
        ]
    for name, f in variants:
        f(latent0).block_until_ready()
        best = None
        for _ in range(args.repeats):
            t0 = time.monotonic()
            x = latent0
            for _ in range(args.calls):
                x = f(x)
            x.block_until_ready()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        us = best * 1e6 / (args.calls * S)
        print(f"{name:18s}: {us:8.1f} us/frame (S={S}, C={C})", flush=True)


if __name__ == "__main__":
    main()

"""Microbenchmark of the whole-backbone megakernel variants, standalone.

Times fused_backbone_decode (ops/fused_backbone.py) at the shipped geometry
(E=1024, H=16, L=6) with the output fed back as the next input inside a
fori_loop, so per-call dispatch overhead amortizes and only the kernel's own
throughput is measured. Used to attribute the backbone marginal cost to
phases (attn_mode="skip" removes the attention inner loop entirely).

CAVEAT: absolute numbers here run ~4x above the kernel's cost inside the
production segment scan (~620 us/step standalone vs 0.13-0.15 ms/frame
backbone marginal from benchmarks/ablate.py — measured r3, same code). The
nested closed_call dispatch inside this harness's fori_loop appears to
serialize against the kernel on this backend. Use this harness for RELATIVE
comparisons between variants only; benchmarks/ablate.py is the authority
for absolute per-frame cost.

Usage: python benchmarks/kernel_micro.py [--capacity 1024] [--iters 64]
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
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=7)
    args = ap.parse_args()

    from pocket_tts_tpu.models.tts_model import enable_compilation_cache
    from pocket_tts_tpu.models.weights import quantize_int8
    from pocket_tts_tpu.ops.fused_backbone import fused_backbone_decode, pack_backbone_int8
    from pocket_tts_tpu.ops.rope import rope_angles
    from pocket_tts_tpu.ops.transformer import StreamingTransformer

    enable_compilation_cache()
    E, H, L, C = 1024, 16, 6, args.capacity
    t = StreamingTransformer(
        d_model=E, num_heads=H, num_layers=L, dim_feedforward=4 * E, kind="flow_lm"
    )
    params = t.init_params(jax.random.PRNGKey(0))
    q = quantize_int8({"flow_lm": {"transformer": params}}, subtrees=("transformer",))
    packed = pack_backbone_int8(q["flow_lm"]["transformer"]["layers"])

    # Slot-major [1, C, H, d] — the global cache layout (ops/attention.py).
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
    slot_pos = jnp.arange(C, dtype=jnp.int32)[None, :]
    qpos = jnp.array([C - 1], jnp.int32)
    cos, sin = rope_angles(jnp.full((1, 1), C - 1, jnp.int32), E // H)
    cos, sin = cos[0, 0, 0], sin[0, 0, 0]
    x0 = jax.random.normal(jax.random.PRNGKey(3), (1, E), jnp.float32) * 0.3

    def make(int8_act, attn_mode, block):
        def body(_, x):
            y, _, _ = fused_backbone_decode(
                packed, x, ks, vs, slot_pos, qpos, cos, sin,
                widx=qpos,  # append over the last row (caches are loop constants)
                num_heads=H, int8_act=int8_act, attn_mode=attn_mode, block=block,
            )
            return jnp.tanh(y)  # bounded feedback keeps values sane

        return jax.jit(lambda x: jax.lax.fori_loop(0, args.iters, body, x))

    def make_head(attn_mode, block):
        # The head-folded production step (fused_backbone_step): latent in,
        # (h, eos) out; feed h's first lanes back as the next latent.
        from pocket_tts_tpu.ops.fused_backbone import (
            fused_backbone_step,
            pack_backbone_head,
        )

        khead = jax.random.split(jax.random.PRNGKey(4), 5)
        head_packed = pack_backbone_head(
            {
                "input_linear": {"weight": jax.random.normal(khead[0], (E, 32)) * 0.1},
                "out_norm": {
                    "weight": jnp.ones((E,), jnp.float32),
                    "bias": jnp.zeros((E,), jnp.float32),
                },
                "out_eos": {
                    "weight": jax.random.normal(khead[1], (1, E)) * 0.03,
                    "bias": jnp.zeros((1,), jnp.float32),
                },
                "bos_emb": jax.random.normal(khead[2], (32,)),
            }
        )
        is_bos = jnp.zeros((1,), jnp.bool_)

        def body(_, lat):
            h, eos, _, _, _ = fused_backbone_step(
                packed, head_packed, lat, is_bos, ks, vs, slot_pos, qpos,
                cos, sin, qpos, num_heads=H, attn_mode=attn_mode, block=block,
            )
            return jnp.tanh(h[:, :32])

        return jax.jit(lambda lat: jax.lax.fori_loop(0, args.iters, body, lat))

    variants = [
        (False, "mxu", "pair"),
        (False, "vpu", "pair"),
        (True, "skip", "pair"),
    ]
    if C <= 512:
        # quad blocks exceed the 16 MiB scoped-VMEM limit past C=512 (this
        # harness calls the kernel directly, bypassing the dispatcher
        # demotion in ops/transformer._fused_decode). The former hbatch
        # attention form was retired by the slot-major cache layout.
        variants += [
            (False, "vpu", "quad"),
            (True, "skip", "quad"),
        ]
    for int8_act, attn_mode, block in variants:
        f = make(int8_act, attn_mode, block)
        f(x0).block_until_ready()  # compile
        best = min(
            _timed(f, x0) for _ in range(args.repeats)
        )
        us = best * 1e6 / args.iters
        print(
            f"int8_act={int(int8_act)} attn={attn_mode:6s} block={block:4s}: "
            f"{us:8.1f} us/step",
            flush=True,
        )

    # The head-folded production step at this bucket's shipped config
    # (select_modes: quad <=512, pair past — tri has no VMEM headroom for
    # the resident head blocks).
    hblock = "quad" if C <= 512 else "pair"
    f = make_head("vpu", hblock)
    lat0 = jax.random.normal(jax.random.PRNGKey(5), (1, 32), jnp.float32)
    f(lat0).block_until_ready()
    best = min(_timed(f, lat0) for _ in range(args.repeats))
    print(
        f"head-folded  attn=vpu    block={hblock:4s}: "
        f"{best * 1e6 / args.iters:8.1f} us/step",
        flush=True,
    )


def _timed(f, x0) -> float:
    t0 = time.monotonic()
    f(x0).block_until_ready()
    return time.monotonic() - t0


if __name__ == "__main__":
    main()

"""Batched decode-attention microbench: where did the KV read bandwidth go?

The r4 roofline fit measured only ~360-400 GB/s effective KV read bandwidth
(~45% of v5e HBM peak) on the batch decode's dominant phase — the per-step
attention over the slot-major [B, C, H, d] cache. This bench isolates that
op at the production shape (B=64, C=512, H=16, d=64, Tq=1) and times
layout/algorithm variants, each chained (every call consumes the previous
call's output so the device cannot overlap iterations) and timed
enqueue-to-device_get:

  slots      — the production _sdpa_slots: dot_general batch dims (B, H)
               absorb the slot-major layout.
  indicator  — scores via ONE standard batched matmul over the flattened
               [B, C, H*d] cache: scores[b,s,h] = K'[b,s,:] @ (q'[b,:] ⊙
               M[:,h]) with M the 0/1 head-indicator matrix. Reads K in its
               NATIVE layout (contraction over the contiguous minor dim);
               burns 16x the MXU flops (still ~µs) to avoid any relayout.
               PV dot unchanged.
  hsd        — cache physically stored [B, H, C, d] (the canonical
               attention layout XLA never needs to relayout). NOT a serving
               option (appends would scatter) — it bounds what a layout
               change could buy.
  int8       — production int8-KV path (rows + per-row scales).

Effective bandwidth = (K+V bytes actually read) / time. If `slots` sits
well below `hsd`/`indicator`, XLA is materializing a relayout of the cache
every step and the fix is algorithmic; if all variants sit at the same
fraction of peak, the gap is the op's intrinsic cost at Tq=1.

Usage: python benchmarks/attn_micro.py [--B 64] [--C 512] [--iters 64]
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

from pocket_tts_tpu.ops.attention import _sdpa_slots, quantize_kv_rows

H, D = 16, 64


def variant_slots(q, k, v, valid):
    return _sdpa_slots(q, k, v, valid)


def variant_int8(q, k8, v8, valid, k_scale, v_scale):
    return _sdpa_slots(q, k8, v8, valid, k_scale, v_scale)


def variant_indicator(q, kflat, v, valid, M):
    """scores through the head-indicator matmul; PV through the batched dot."""
    B = q.shape[0]
    d = D
    qflat = q.reshape(B, H * D)  # [B, J]
    qm = qflat[:, :, None] * M[None]  # [B, J, H] — tiny (2 MB at B=64)
    scores = jax.lax.dot_general(
        kflat.astype(jnp.bfloat16),
        qm.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, C, H]
    scores = scores.transpose(0, 2, 1)[:, :, None, :] * (1.0 / np.sqrt(d))  # [B,H,1,C]
    scores = jnp.where(valid, scores, -1e9)
    w = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        w.astype(v.dtype),
        v,
        dimension_numbers=(((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def variant_hsd(q, k_hsd, v_hsd, valid):
    """Canonical [B, H, C, d] layout: both dots in standard form."""
    d = q.shape[-1]
    scores = jax.lax.dot_general(
        q.astype(k_hsd.dtype),
        k_hsd,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ) * (1.0 / np.sqrt(d))
    scores = jnp.where(valid, scores, -1e9)
    w = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        w.astype(v_hsd.dtype),
        v_hsd,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--C", type=int, default=512)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()
    B, C = args.B, args.C

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, 1, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, C, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, C, H, D), jnp.bfloat16)
    valid = jnp.ones((B, 1, 1, C), bool)
    k8, k_scale = quantize_kv_rows(k)
    v8, v_scale = quantize_kv_rows(v)
    M = jnp.zeros((H * D, H), jnp.bfloat16)
    M = M.at[jnp.arange(H * D), jnp.arange(H * D) // D].set(1.0)

    bytes_bf16 = 2 * B * C * H * D * 2  # K+V
    bytes_int8 = B * C * H * D * 2  # int8 rows (scales negligible)

    def run(name, fn, operands, nbytes):
        # Chain: q_{i+1} derives from out_i so iterations serialize.
        def chained(q0, n):
            out = None
            qi = q0
            for _ in range(n):
                out = fn(qi, *operands)
                qi = out * 1e-6 + q0  # tiny feedback, keeps magnitude sane
            return out

        jfn = jax.jit(chained, static_argnums=1)
        jax.block_until_ready(jfn(q, args.iters))  # compile + warm
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.monotonic()
            jax.block_until_ready(jfn(q, args.iters))
            best = min(best, time.monotonic() - t0)
        us = best * 1e6 / args.iters
        gbs = nbytes / (best / args.iters) / 1e9
        print(f"{name:10s} {us:8.1f} us/step  {gbs:7.0f} GB/s effective", flush=True)
        return us

    def variant_readsum(q, kflat, vflat):
        """Pure streaming read of K+V (one f32 reduce each): the achievable
        bandwidth ceiling for this shape, no attention math at all. The
        chained q enters as a broadcast scalar weight so iterations cannot
        be CSE'd away (the multiply fuses into the read, no extra copy)."""
        w = q[0, 0, 0, 0].astype(jnp.float32)
        s = jnp.sum(kflat.astype(jnp.float32) * w, axis=(1, 2)) + jnp.sum(
            vflat.astype(jnp.float32) * w, axis=(1, 2)
        )  # [B]
        return q + s[:, None, None, None].astype(q.dtype) * 1e-9

    def variant_ind2(q, kflat, vflat, valid, M):
        """Both dots through the head-indicator form — K and V read in their
        NATIVE [B, C, H*d] layout, zero relayout anywhere. PV:
        out[b, j] = sum_s w_exp[b, s, j] * V'[b, s, j] with w_exp = W @ M^T
        fused into the reduce (XLA fuses the [B,C,H]x[H,J] expand +
        multiply + sum into one pass over V')."""
        B = q.shape[0]
        qflat = q.reshape(B, H * D)
        qm = qflat[:, :, None] * M[None]  # [B, J, H]
        scores = jax.lax.dot_general(
            kflat.astype(jnp.bfloat16),
            qm.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / np.sqrt(D))  # [B, C, H]
        scores = jnp.where(valid[:, 0].transpose(0, 2, 1), scores, -1e9)
        w = jax.nn.softmax(scores, axis=1)  # [B, C, H]
        w_exp = jax.lax.dot_general(
            w.astype(jnp.bfloat16),
            M.T.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, C, J] -- expect XLA to fuse this into the reduce below
        out = jnp.sum(w_exp * vflat.astype(jnp.float32), axis=1)  # [B, J]
        return out.reshape(B, H, 1, D).astype(q.dtype)

    ones_j = jnp.ones((H * D,), jnp.bfloat16)

    def variant_readdot(q, kflat, vflat):
        """MXU-based pure read: contract the minor dim with a ones vector —
        one streaming pass per array, reduce on the MXU (usually the fastest
        XLA-expressible bandwidth probe)."""
        w = (ones_j * q[0, 0, 0, 0].astype(jnp.bfloat16))  # CSE guard
        s = jax.lax.dot_general(
            kflat, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).sum(axis=1) + jax.lax.dot_general(
            vflat, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).sum(axis=1)
        return q + s[:, None, None, None].astype(q.dtype) * 1e-9

    def variant_pallas_read(q, kflat, vflat):
        """Explicit Pallas streaming read: grid over row blocks, Pallas
        double-buffers the block DMA; body is one f32 reduce per block.
        What the hardware actually sustains with software pipelining —
        if this beats readsum/readdot, XLA's pipelining (not the HBM) is
        what the batch decode is leaving on the table."""
        from jax.experimental import pallas as pl

        BLK = 512  # rows of (H*D) lanes per grid step (1 MiB bf16)
        rows = B * C
        flat2 = kflat.reshape(rows, H * D)
        flat2v = vflat.reshape(rows, H * D)

        def kern(tok_ref, kref, vref, oref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                oref[...] = tok_ref[...] * 1e-20  # serializes the chain

            part = jnp.sum(kref[...].astype(jnp.float32), axis=0) + jnp.sum(
                vref[...].astype(jnp.float32), axis=0
            )  # [H*D] per-lane partial sums
            oref[...] += part.reshape(8, (H * D) // 8)

        tok = q[0, :8, 0, :].astype(jnp.float32)  # [8, 64] -> pad lanes
        tok = jnp.pad(tok, ((0, 0), (0, (H * D) // 8 - D)))
        out = pl.pallas_call(
            kern,
            grid=(rows // BLK,),
            in_specs=[
                pl.BlockSpec((8, (H * D) // 8), lambda i: (0, 0)),
                pl.BlockSpec((BLK, H * D), lambda i: (i, 0)),
                pl.BlockSpec((BLK, H * D), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((8, (H * D) // 8), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, (H * D) // 8), jnp.float32),
        )(tok, flat2, flat2v)
        return q + jnp.sum(out).astype(q.dtype) * 1e-9

    print(f"B={B} C={C} H={H} d={D}  KV bytes/step: bf16={bytes_bf16/1e6:.0f} MB "
          f"int8={bytes_int8/1e6:.0f} MB", flush=True)
    kflat, vflat = k.reshape(B, C, H * D), v.reshape(B, C, H * D)
    run("readsum", variant_readsum, (kflat, vflat), bytes_bf16)
    run("readdot", variant_readdot, (kflat, vflat), bytes_bf16)
    run("pallas_read", variant_pallas_read, (kflat, vflat), bytes_bf16)
    run("slots", variant_slots, (k, v, valid), bytes_bf16)
    run("indicator", variant_indicator, (kflat, v, valid, M), bytes_bf16)
    run("ind2", variant_ind2, (kflat, vflat, valid, M), bytes_bf16)
    k_hsd = jnp.asarray(np.asarray(k.transpose(0, 2, 1, 3)))
    v_hsd = jnp.asarray(np.asarray(v.transpose(0, 2, 1, 3)))
    run("hsd", variant_hsd, (k_hsd, v_hsd, valid), bytes_bf16)
    run("int8", variant_int8, (k8, v8, valid, k_scale, v_scale), bytes_int8)

    # The round-5 Pallas kernel (ops/batch_attention.py): one streaming
    # pass, indicator-matmul scores, online softmax.
    from pocket_tts_tpu.ops.batch_attention import batch_decode_attention

    sp = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None], (B, C))
    qpos = jnp.full((B,), C, jnp.int32)

    def variant_kernel(q, k, v):
        return batch_decode_attention(q, k, v, sp, qpos, num_heads=H)

    def variant_kernel_int8(q, k8, v8):
        return batch_decode_attention(
            q, k8, v8, sp, qpos, k_scale, v_scale, num_heads=H
        )

    run("kernel", variant_kernel, (k, v), bytes_bf16)
    run("kernel_i8", variant_kernel_int8, (k8, v8), bytes_int8)


if __name__ == "__main__":
    main()

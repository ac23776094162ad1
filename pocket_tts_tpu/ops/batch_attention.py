"""Pallas TPU batched decode-attention kernel (Tq=1) over the slot-major KV
cache — one streaming pass, zero relayout, MXU-shaped score math.

Why: the batch decode is KV-read bound (BENCHMARKS.md batch roofline), but
XLA's lowering of the per-step attention leaves a large latency term on the
table at the serving shape (B=64, C=512, H=16, d=64): the batched
dot_general forms decompose into B·H tiny [1, d] x [d, C] matvecs whose
fixed issue latency — not the HBM stream — dominates (measured 575 µs/op vs
a 368 µs pure-read floor; the canonical [B, H, C, d] layout measures the
SAME 566 µs, so relayout is not the cost — benchmarks/attn_micro.py). The
int8-KV path is worse: XLA materializes the int8->bf16 upcast as a separate
pass (734 µs/op for HALF the bytes).

The kernel streams each stream's K/V rows exactly once in their NATIVE
(C, H·d) slot-major layout and keeps the math MXU-shaped via the
head-indicator trick:

  scores[s, h] = K'[s, :] @ (q ⊙ M)[:, h]      -- ONE [blk, J] x [J, H]
                                                  matmul per block (M is the
                                                  0/1 head-indicator, J=H·d)
  out[j]      = Σ_s softmax(w)[s, head(j)] · V'[s, j]
              = Σ_s (W @ Mᵀ)[s, j] · V'[s, j]  -- [blk, H] x [H, J] matmul
                                                  + one fused VPU
                                                  multiply-reduce over V'

Masking/validity matches ops/attention.CausalKVAttention exactly:
valid = (slot_pos >= 0) & (slot_pos <= qpos). The caller precomputes it as
an additive f32 bias [B, R, 1] (0 or -1e9) — per-row vectors enter the
kernel with a TRAILING singleton dim because Mosaic's block rule requires
the last two block dims to divide (8, 128) or equal the array dims; a
[B, R] row-vector block (1, blk) satisfies neither, while (1, blk, 1)
does, and a [blk, 1] load broadcasts across lanes for free. int8 KV mode
consumes the int8 rows directly (the upcast feeds the MXU operand stream —
the fast path; a VPU int8->f32 unpack measures ~5x slower, bw_probe.py)
with per-row scales applied to scores and to the PV product exactly like
_sdpa_slots.

The C dimension is processed in row blocks with a running (max, sum, acc)
— the standard online-softmax recursion — so any read_limit R (static,
128-bucketed by the caller) works with VMEM ~2 blocks.

Numerics vs the XLA oracle (_sdpa_slots): same operand roundings (bf16
dots, f32 softmax) but different accumulation ORDER (indicator matmul sums
64 zeros per head term; online softmax rescales) — parity is tested to
float tolerance, not bitwise (tests/test_batch_attention.py). One edge
deliberately differs: a stream with ZERO valid rows gets output 0 here vs
the XLA softmax's uniform average of garbage rows — both are masked-off
lanes downstream (inactive engine slots).

Dispatched from CausalKVAttention.__call__ for T==1 decode steps at B > 1
on TPU when POCKET_TTS_BATCH_ATTN=1 opts in — DEFAULT OFF: standalone the
kernel wins (497 vs 734 µs/op int8 at B=64, C=512), but in the production
segment program it loses ~4× (see batch_attn_enabled and BENCHMARKS.md r5
"batch attention kernel"); every other path (prefill, T>1, CPU, B==1
megakernel) is unchanged either way.

Reference behavior covered: pocket_tts_mlx/modules/attention.py:108-182
(causal KV attention semantics) — redesigned as a TPU streaming kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pocket_tts_tpu.utils.env import env_flag

_NEG_INF = -1e9


def batch_attn_enabled() -> bool:
    """Pallas batched decode attention — DEFAULT OFF (measured negative
    result, kept for the record/microbench). The kernel beats the XLA op
    STANDALONE (497 vs 734 µs int8 at B=64, C=512) but loses ~4× IN
    CONTEXT (backbone marginal 6.9 vs 1.69 ms/step bf16, 6.2 vs 1.33
    int8 — BENCHMARKS.md r5 'batch attention kernel'): the pallas_call is
    a scheduling/fusion barrier XLA cannot overlap, the same lesson the r1
    flash-decode kernel taught at B=1. The in-context XLA path already
    sits AT the chip's measured achievable streaming-read rate.
    POCKET_TTS_BATCH_ATTN=1 opts in (microbench / future-layout work)."""
    return env_flag("POCKET_TTS_BATCH_ATTN", False)


def _kernel(
    qm_ref,  # [1, J, H] f32 — this stream's (q ⊙ M) score operand
    bias_ref,  # [1, blk, 1] f32 — additive mask (0 valid / -1e9 invalid)
    k_ref,  # [1, blk, J] cache dtype (bf16 | int8)
    v_ref,  # [1, blk, J]
    ks_ref,  # [1, blk, 1] f32 per-row K scales (int8 mode; ones otherwise)
    vs_ref,  # [1, blk, 1] f32 per-row V scales
    mt_ref,  # [H, J] bf16 — Mᵀ head-expansion constant
    o_ref,  # [1, 8, J] f32 out; row 0 = attention output, rows 1..7 unread
    m_s,  # [8, 128] f32 scratch: running max (lanes 0..H-1 of row 0)
    l_s,  # [8, 128] f32 scratch: running denom
    acc_s,  # [8, J] f32 scratch: running numerator (row 0)
    *,
    num_heads: int,
    head_dim: int,
    blocks: int,
    scale: float,
    int8_kv: bool,
):
    c = pl.program_id(1)
    H, d = num_heads, head_dim
    J = H * d

    @pl.when(c == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    kblk = k_ref[0]  # [blk, J]
    # Compute dtype mirrors _sdpa_slots: the cache dtype, with int8 rows
    # upcast to bf16 (the upcast feeds the MXU operand stream — the fast
    # int8 path; a VPU int8->f32 unpack measures ~5x slower, bw_probe.py).
    cd = jnp.bfloat16 if int8_kv else kblk.dtype
    # ONE MXU matmul for all heads' scores: [blk, J] x [J, H] -> [blk, H].
    # f32 accumulation; q was folded into qm by the caller (q ⊙ M columns).
    scores = jax.lax.dot(
        kblk.astype(cd), qm_ref[0].astype(cd), preferred_element_type=jnp.float32
    )  # [blk, H]
    if int8_kv:
        scores = scores * ks_ref[0]  # [blk, 1] broadcasts across the H lanes
    bias = bias_ref[0]  # [blk, 1]: 0 valid / -1e9 invalid
    scores = scores * scale + bias

    # Online softmax over the C blocks. m/l live in lanes 0..H-1 of row 0.
    m_prev = m_s[0:1, :H]  # [1, H]
    m_blk = jnp.max(scores, axis=0, keepdims=True)  # [1, H]
    m_new = jnp.maximum(m_prev, m_blk)
    alpha = jnp.exp(m_prev - m_new)  # [1, H]
    w = jnp.exp(scores - m_new)  # [blk, H]
    # A fully-masked BLOCK would give exp(-1e9 - (-1e9)) = 1 for every
    # masked row — re-mask with the bias (w is f32; the select is free).
    w = jnp.where(bias < -1e8, 0.0, w)
    l_s[0:1, :H] = l_s[0:1, :H] * alpha + jnp.sum(w, axis=0, keepdims=True)
    m_s[0:1, :H] = m_new

    # PV on the MXU: contract the row dim of w [blk, H] against V' [blk, J]
    # directly (lhs-transposed matmul — native MXU form, no materialized
    # transpose) -> out2 [H, J]; the true output is its per-head diagonal
    # band out2[head(j), j], assembled from H static 64-lane slices (the
    # flat-row pattern of the backbone kernel). Computing the 15/16 unused
    # cross terms is ~free on the MXU, while the elementwise
    # expand-multiply-reduce form it replaces cost ~1.5 µs/block of VPU
    # (measured: bf16 kernel 564 -> ~460 µs/op at C=512). Per-row V scales
    # (int8 mode) fold into w BEFORE the contraction — algebraically
    # identical to _sdpa_slots' weights·v_scale fold, and [blk, H] is 64x
    # cheaper to scale than [blk, J].
    if int8_kv:
        w = w * vs_ref[0]
    out2 = jax.lax.dot_general(
        w.astype(cd),
        v_ref[0].astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, J]
    # part[0, j] = out2[head(j), j]: each Mᵀ column has exactly one 1, so a
    # masked 16-row reduce extracts the per-head diagonal band ([H, J] is
    # tiny; a 16-way concatenate of misaligned [1, 64] slices is rejected
    # by Mosaic's layout checker).
    mt_f32 = mt_ref[...].astype(jnp.float32)
    part = jnp.sum(out2 * mt_f32, axis=0, keepdims=True)  # [1, J]
    # Head -> lane expansion of the f32 rescale/denominator rows via an f32
    # matmul against the 0/1 indicator: exact (each product is value x 1
    # under f32 accumulation), so the online-softmax rescale loses nothing.
    alpha_exp = jax.lax.dot(alpha, mt_f32, preferred_element_type=jnp.float32)
    acc_s[0:1, :] = acc_s[0:1, :] * alpha_exp + part

    @pl.when(c == blocks - 1)
    def _():
        l_exp = jax.lax.dot(
            l_s[0:1, :H], mt_f32, preferred_element_type=jnp.float32
        )  # [1, J]
        # Row-0 masked store (`.at[].set` would lower to an unsupported
        # scatter in Mosaic); rows 1..7 of the output block are never read.
        o_ref[0, 0:1, :] = acc_s[0:1, :] / jnp.maximum(l_exp, 1e-30)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "read_rows", "block_rows", "interpret")
)
def batch_decode_attention(
    q: jnp.ndarray,  # [B, H, 1, d] (f32 or bf16) — post-RoPE queries
    k: jnp.ndarray,  # [B, C, H, d] slot-major cache (bf16 | int8), FULL buffer
    v: jnp.ndarray,  # [B, C, H, d]
    slot_pos: jnp.ndarray,  # [B, R] int32 (-1 = invalid), R = read_rows or C
    qpos: jnp.ndarray,  # [B] int32 query positions
    k_scale: jnp.ndarray | None = None,  # [B, R] f32 (int8 mode)
    v_scale: jnp.ndarray | None = None,
    *,
    num_heads: int,
    read_rows: int | None = None,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q·K/√d + mask)·V over the slot-major cache; returns
    [B, H, 1, d] in q's dtype. Caller contract mirrors _sdpa_slots with
    valid = (slot_pos >= 0) & (slot_pos <= qpos) — the decode-step masking
    of CausalKVAttention (the appended row's own position == qpos, so the
    self-term is included).

    read_rows (static): bound the cache rows READ to k[:, :read_rows] —
    enforced by the GRID (the kernel's index maps never touch rows past
    it), NOT by slicing the operands. This matters: handing pallas_call a
    sliced cache (k[:, :R]) forces XLA to MATERIALIZE the slice as a copy
    before the call — ~2·B·R·J bytes per layer per step, which in-context
    cost MORE than the whole XLA attention it replaced (measured: B=64
    backbone marginal 5.5 ms/step vs 1.69 XLA — BENCHMARKS.md r5 batch
    attention). The full donated cache buffer goes in unchanged; only the
    tiny per-row operands (bias, scales) are sliced by the caller."""
    B, C, H, d = k.shape
    R = C if read_rows is None else int(read_rows)
    assert R <= C and slot_pos.shape[1] == R, (R, C, slot_pos.shape)
    J = H * d
    int8_kv = k.dtype == jnp.int8
    assert int8_kv == (k_scale is not None and v_scale is not None)
    blk = block_rows if R % block_rows == 0 else 128
    blk = min(blk, R)
    assert R % blk == 0, (R, blk)  # R is always 128-bucketed by callers
    blocks = R // blk

    # Head-indicator constants. M: [J, H] with M[j, h] = (j // d == h);
    # qm = q ⊙ M columns — [B, J, H], tiny (2 MB at B=64), built in XLA so
    # the kernel never materializes per-head slices.
    j_idx = jnp.arange(J, dtype=jnp.int32)
    m_mat = (j_idx[:, None] // d == jnp.arange(H, dtype=jnp.int32)[None, :])
    qflat = q.astype(jnp.float32).reshape(B, J)  # [B, H*d] head-major
    qm = qflat[:, :, None] * m_mat.astype(jnp.float32)[None]  # [B, J, H]
    mt = m_mat.T.astype(jnp.bfloat16)  # [H, J]

    # Validity as an additive f32 bias with a trailing singleton dim (the
    # Mosaic block rule; module docstring). 128 KB at B=64, C=512 — noise
    # next to the 134 MB cache read.
    valid = (slot_pos >= 0) & (slot_pos <= qpos[:, None])
    bias = jnp.where(valid, 0.0, _NEG_INF).astype(jnp.float32)[:, :, None]

    ones = jnp.ones((B, R, 1), jnp.float32)
    ks = k_scale.astype(jnp.float32)[:, :, None] if int8_kv else ones
    vs = v_scale.astype(jnp.float32)[:, :, None] if int8_kv else ones

    # Collapsing the head dims of the UNSLICED cache is a free bitcast; the
    # grid bounds the rows actually DMA'd to [:R].
    k2, v2 = k.reshape(B, C, J), v.reshape(B, C, J)

    kernel = functools.partial(
        _kernel,
        num_heads=H,
        head_dim=d,
        blocks=blocks,
        scale=1.0 / math.sqrt(d),
        int8_kv=int8_kv,
    )

    out = pl.pallas_call(
        kernel,
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec((1, J, H), lambda b, c: (b, 0, 0)),  # qm
            pl.BlockSpec((1, blk, 1), lambda b, c: (b, c, 0)),  # bias
            pl.BlockSpec((1, blk, J), lambda b, c: (b, c, 0)),  # k
            pl.BlockSpec((1, blk, J), lambda b, c: (b, c, 0)),  # v
            pl.BlockSpec((1, blk, 1), lambda b, c: (b, c, 0)),  # k_scale
            pl.BlockSpec((1, blk, 1), lambda b, c: (b, c, 0)),  # v_scale
            pl.BlockSpec((H, J), lambda b, c: (0, 0)),  # Mᵀ
        ],
        out_specs=pl.BlockSpec((1, 8, J), lambda b, c: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),  # m_s
            pltpu.VMEM((8, 128), jnp.float32),  # l_s
            pltpu.VMEM((8, J), jnp.float32),  # acc_s
        ],
        out_shape=jax.ShapeDtypeStruct((B, 8, J), jnp.float32),
        interpret=interpret,
    )(
        qm,
        bias,
        k2,
        v2,
        ks,
        vs,
        mt,
    )
    return out[:, 0, :].reshape(B, H, 1, d).astype(q.dtype)

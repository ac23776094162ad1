"""Streaming attention with static-shape caches.

Two flavors, mirroring the reference semantics but redesigned for XLA:

- CausalKVAttention (FlowLM backbone): a slot-indexed KV cache with a
  batch-common write index and per-slot absolute positions, so appends are a
  single contiguous dynamic_update_slice and heterogeneous batches need no
  scatter (see class docstring). The reference grows its cache dynamically
  and encodes position in an array *shape*
  (reference: pocket_tts_mlx/modules/attention.py:108-182, :127-137).

- WindowedRingAttention (Mimi codec): a shift-append ring — the cache stays
  ordered oldest -> newest so the update is a static slice+concat and slot
  positions are pure arithmetic. The reference scatters into its ring with a
  Python B*T loop (reference: pocket_tts_mlx/modules/attention.py:67-105,
  noted there as an MLX workaround).

Cache layout is **slot-major** `[B, slots, H, d]` (not `[B, H, slots, d]`):
one appended frame is then a single contiguous row of H*d elements, which is
what lets (a) the append be one dense dynamic_update_slice, and (b) the
decode megakernel (ops/fused_backbone.py) view the cache as a 2-D `(C, H*d)`
array whose 128-lane tiling is exactly aligned — Mosaic rejects DMAs that
slice the lane-padded d=64 minor dim of an `[H, C, d]` layout on hardware
(scripts/mosaic_probe.py documents the two primitives the 2-D view needs).
The SDPA consumes the layout directly via dot_general batch dims — no
materialized transpose on the XLA path either.

Both take positions [B, T] (int32 absolute stream positions, -1 = padding),
which is what makes batched serving with per-stream offsets possible (the
reference is hard-coded to batch 1).

All masks are applied as float32 select before softmax; matmuls accumulate in
float32 via preferred_element_type.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from pocket_tts_tpu.ops.linear import linear, qkv_proj
from pocket_tts_tpu.ops.rope import apply_rope, rope_angles


Params = dict
State = dict

_NEG_INF = -1e9


def _split_qkv(projected: jnp.ndarray, num_heads: int) -> tuple[jnp.ndarray, ...]:
    """[B, T, 3, F] (from ops.linear.qkv_proj) -> three [B, T, H, d].

    F is head-major, so under tensor parallelism the F axis's sharding flows
    into H without a collective (packing matches the checkpoint's in_proj
    layout: q rows, then k rows, then v rows)."""
    B, T, three, F = projected.shape
    d = F // num_heads
    packed = projected.reshape(B, T, 3, num_heads, d)
    return packed[:, :, 0], packed[:, :, 1], packed[:, :, 2]


def _sdpa(
    q: jnp.ndarray,  # [B, H, Tq, d]
    k: jnp.ndarray,  # [B, H, Tk, d] (may be lower precision: bf16 KV cache)
    v: jnp.ndarray,  # [B, H, Tk, d]
    valid: jnp.ndarray,  # bool, broadcastable to [B, H, Tq, Tk]
) -> jnp.ndarray:
    """Masked softmax(q k^T / sqrt(d)) v; float32 softmax and accumulation.

    Matmuls run in the KV cache's dtype (q is cast down when the cache is
    bf16), so serving-mode caches halve attention HBM traffic while scores
    and the output still accumulate in float32.
    """
    out_dtype = q.dtype
    d = q.shape[-1]
    scores = lax.dot_general(
        q.astype(k.dtype),
        k,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(d))
    scores = jnp.where(valid, scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = lax.dot_general(
        weights.astype(v.dtype),
        v,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def _sdpa_slots(
    q: jnp.ndarray,  # [B, H, Tq, d]
    k: jnp.ndarray,  # [B, S, H, d] slot-major cache (may be bf16)
    v: jnp.ndarray,  # [B, S, H, d]
    valid: jnp.ndarray,  # bool, broadcastable to [B, H, Tq, S]
    k_scale: jnp.ndarray | None = None,  # f32 [B, S] per-row dequant scales
    v_scale: jnp.ndarray | None = None,  # (int8 KV cache mode)
) -> jnp.ndarray:
    """_sdpa over a slot-major [B, S, H, d] cache — dot_general batch dims
    absorb the layout difference, so no transpose is materialized. Numerics
    identical to _sdpa (f32 scores/softmax, matmuls in the cache dtype).

    int8 KV mode (k/v int8, scales given): the dots consume the int8 rows
    upcast to bf16 — XLA fuses the convert into the dot's operand read, so
    HBM traffic stays 1 byte/element — and the per-row scales are applied
    OUTSIDE the contractions, exactly: scores·k_scale (the k rows share one
    scale over H·d) and weights·v_scale folded into the f32 softmax weights
    before the PV dot. The batch decode is KV-read bound (BENCHMARKS.md
    batch roofline), so halving cache bytes is the direct lever.
    """
    # int8 rows without their dequant scales would silently compute
    # wrong-magnitude attention; fail loudly instead (ADVICE r4).
    assert (k.dtype == jnp.int8) == (k_scale is not None and v_scale is not None), (
        "int8 KV rows require k_scale/v_scale (and vice versa)"
    )
    out_dtype = q.dtype
    d = q.shape[-1]
    compute_dtype = jnp.bfloat16 if k.dtype == jnp.int8 else k.dtype
    scores = lax.dot_general(
        q.astype(compute_dtype),
        k.astype(compute_dtype),
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32,
    )  # [B, H, Tq, S]
    if k_scale is not None:
        scores = scores * (k_scale * (1.0 / math.sqrt(d)))[:, None, None, :]
    else:
        scores = scores * (1.0 / math.sqrt(d))
    scores = jnp.where(valid, scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        weights = weights * v_scale[:, None, None, :]
    out = lax.dot_general(
        weights.astype(compute_dtype),
        v.astype(compute_dtype),
        dimension_numbers=(((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32,
    )  # [B, H, Tq, d]
    return out.astype(out_dtype)


def quantize_kv_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization of [B, T, H, d] K/V rows.

    One absmax scale per appended frame row (over the H·d elements a slot
    holds): rows are the cache's DMA/gather granularity, so the scale array
    is tiny ([B, T] f32, 0.2% of the row bytes) and every downstream
    row-mover (engine park/resume/swap, compaction, admission splice)
    carries it exactly like slot_pos.

    Tradeoff (deliberate): the scale is shared across ALL heads in the row,
    so one outlier head degrades int8 resolution for every other head in
    that frame. Per-(row, head) scales ([B, T, H]) would isolate outliers
    at negligible extra bytes if quality headroom is ever needed; measured
    row-relative RMS error on Gaussian-statistics K/V at the shipped
    geometry (H=16, d=64) is ~0.8% median / <1.5% max
    (tests/test_kv_int8.py::test_row_relative_error_pinned)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3))  # [B, T]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[:, :, None, None]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _init_proj_params(key: jax.Array, embed_dim: int, dtype) -> Params:
    k1, k2 = jax.random.split(key)
    s_in = 1.0 / math.sqrt(embed_dim)
    return {
        # Stored [3, E, E] (checkpoint's [3E, E] with the qkv sections
        # unpacked into a leading axis at load) so attention-head TP shards
        # it with PartitionSpec(None, 'tp', None) — see ops/linear.qkv_proj.
        "in_proj": {
            "weight": jax.random.uniform(
                k1, (3, embed_dim, embed_dim), minval=-s_in, maxval=s_in, dtype=dtype
            )
        },
        "out_proj": {
            "weight": jax.random.uniform(
                k2, (embed_dim, embed_dim), minval=-s_in, maxval=s_in, dtype=dtype
            )
        },
    }


@dataclass(frozen=True)
class CausalKVAttention:
    """Full-history causal attention with a slot-indexed KV cache.

    Storage is decoupled from stream position: every call appends its T
    entries at a batch-common write index (`widx`, one contiguous
    dynamic_update_slice — never a scatter, which lowers catastrophically on
    TPU for per-stream offsets), while each slot records the *absolute stream
    position* it holds in `slot_pos` ([B, capacity], -1 = invalid). Masking is
    computed from positions, so right-padded prefills (positions -1 beyond a
    stream's length) and heterogeneous batches cost nothing: padded slots are
    simply never valid. The reference encodes position in the cache's array
    shape instead (pocket_tts_mlx/modules/attention.py:127-137).
    """

    embed_dim: int
    num_heads: int
    max_period: float = 10_000.0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return _init_proj_params(key, self.embed_dim, dtype)

    def init_state(self, batch_size: int, capacity: int, dtype=jnp.float32) -> State:
        # Slot-major [B, slots, H, d]: an appended frame is one contiguous
        # H*d row — see the module docstring for why this layout is load-
        # bearing for the Pallas decode megakernel.
        #
        # dtype=int8 selects the quantized KV cache: rows store symmetric
        # int8 with one f32 absmax scale per row ([B, capacity], shaped and
        # moved exactly like slot_pos). Halves the cache-read bytes of the
        # KV-read-bound batch decode (BENCHMARKS.md batch roofline).
        shape = (batch_size, capacity, self.num_heads, self.head_dim)
        state = {
            "k": jnp.zeros(shape, dtype=dtype),
            "v": jnp.zeros(shape, dtype=dtype),
            "slot_pos": jnp.full((batch_size, capacity), -1, dtype=jnp.int32),
        }
        if jnp.dtype(dtype) == jnp.int8:
            state["k_scale"] = jnp.zeros((batch_size, capacity), dtype=jnp.float32)
            state["v_scale"] = jnp.zeros((batch_size, capacity), dtype=jnp.float32)
        return state

    def __call__(
        self,
        params: Params,
        x: jnp.ndarray,  # [B, T, E]
        state: State,
        positions: jnp.ndarray,  # int32 [B, T]: absolute positions, -1 = padding
        widx: jnp.ndarray = None,  # scalar int32 write index (stack-level state)
        rope_cache: tuple | None = None,
        read_limit: int | None = None,
        batch_kernel: bool = False,
    ) -> tuple[jnp.ndarray, State]:
        """batch_kernel (static) routes T==1, B>1 decode steps to the Pallas
        streaming attention kernel (ops/batch_attention.py) — OPT-IN
        (POCKET_TTS_BATCH_ATTN=1): the kernel wins standalone but loses
        ~4× in context at the pallas_call fusion barrier (BENCHMARKS.md
        round-5 batch attention). The caller asserts platform fitness
        (TPU, no mesh); this module additionally requires 128-aligned
        lane/row geometry. Appends and state layout are IDENTICAL either
        way — only the softmax(QK^T)V read path changes.

        read_limit (static) bounds the cache rows attention READS to
        [:, :read_limit]: the decode step is KV-read bandwidth bound at
        batch (BENCHMARKS.md batch roofline), and a utterance's valid rows
        occupy only the front of the capacity bucket — the host knows how
        many at dispatch time. CALLER's contract: every valid slot,
        including the T rows this call appends at widx, lies below
        read_limit (R >= widx + T); appends still write the full cache."""
        B, T, _ = x.shape

        projected = qkv_proj(x, params["in_proj"]["weight"])
        q, k, v = _split_qkv(projected, self.num_heads)

        q, k = apply_rope(
            q, k, jnp.maximum(positions, 0), self.max_period, rope_cache=rope_cache
        )

        # k/v are already [B, T, H, d] — the slot-major cache appends them
        # with NO transpose (one contiguous T*H*d block per stream).
        int8_kv = state["k"].dtype == jnp.int8
        if int8_kv:
            k_app, k_app_scale = quantize_kv_rows(k)
            v_app, v_app_scale = quantize_kv_rows(v)
        else:
            k_app, v_app = k.astype(state["k"].dtype), v.astype(state["v"].dtype)
        k_cache = lax.dynamic_update_slice(state["k"], k_app, (0, widx, 0, 0))
        v_cache = lax.dynamic_update_slice(state["v"], v_app, (0, widx, 0, 0))
        slot_pos = lax.dynamic_update_slice(state["slot_pos"], positions, (0, widx))
        if int8_kv:
            k_scale = lax.dynamic_update_slice(state["k_scale"], k_app_scale, (0, widx))
            v_scale = lax.dynamic_update_slice(state["v_scale"], v_app_scale, (0, widx))

        R = k_cache.shape[1]
        if read_limit is not None:
            R = max(8, min(int(read_limit), R))
        k_read, v_read, sp_read = k_cache[:, :R], v_cache[:, :R], slot_pos[:, :R]
        ks_read = k_scale[:, :R] if int8_kv else None
        vs_read = v_scale[:, :R] if int8_kv else None

        q = q.transpose(0, 2, 1, 3)  # [B, H, T, d]
        if (
            batch_kernel
            and T == 1
            and B > 1
            and self.embed_dim % 128 == 0
            and R % 128 == 0
        ):
            from pocket_tts_tpu.ops.batch_attention import batch_decode_attention
            from pocket_tts_tpu.ops.fused_backbone import fused_interpret_enabled

            # FULL cache buffers go to the kernel (its grid stops at R):
            # passing the k_read/v_read slices would make XLA materialize
            # them as copies before the pallas_call — in-context that copy
            # cost 3x the attention itself (see batch_decode_attention).
            out = batch_decode_attention(
                q, k_cache, v_cache, sp_read, positions[:, 0],
                ks_read, vs_read, num_heads=self.num_heads, read_rows=R,
                interpret=fused_interpret_enabled(),
            )
        else:
            # Query at absolute position p attends to slots holding positions
            # [0, p]; invalid slots (-1) and padded queries are masked out.
            valid = (
                (sp_read[:, None, :] >= 0)
                & (sp_read[:, None, :] <= positions[:, :, None])
            )  # [B, T, R]
            out = _sdpa_slots(q, k_read, v_read, valid[:, None], ks_read, vs_read)

        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.embed_dim)
        new_state = {"k": k_cache, "v": v_cache, "slot_pos": slot_pos}
        if int8_kv:
            new_state["k_scale"] = k_scale
            new_state["v_scale"] = v_scale
        return linear(out, params["out_proj"]["weight"]), new_state

    def forward(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Cache-free full-sequence causal attention (training / teacher-forced
        scoring path; inference uses the KV-cache __call__)."""
        B, T, _ = x.shape
        projected = qkv_proj(x, params["in_proj"]["weight"])
        q, k, v = _split_qkv(projected, self.num_heads)
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
        q, k = apply_rope(q, k, positions, self.max_period)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        idx = jnp.arange(T, dtype=jnp.int32)
        valid = idx[None, :] <= idx[:, None]
        out = _sdpa(q, k, v, valid[None, None])
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.embed_dim)
        return linear(out, params["out_proj"]["weight"])


@dataclass(frozen=True)
class WindowedRingAttention:
    """Sliding-window causal attention over a fixed-capacity ring buffer.

    Window semantics match the reference predicate
    (pos_k >= 0) & (delta >= 0) & (delta < context)
    (reference: pocket_tts_mlx/modules/attention.py:244-254). Capacity may be
    any value >= context + chunk; slot positions are derived arithmetically
    from the write offset, so validity masking is exact even after wraparound.
    """

    embed_dim: int
    num_heads: int
    context: int
    max_period: float = 10_000.0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return _init_proj_params(key, self.embed_dim, dtype)

    def init_state(self, batch_size: int, capacity: int | None = None, dtype=jnp.float32) -> State:
        if capacity is None:
            # Smallest 128-aligned ring that always retains a full window.
            capacity = ((self.context + 127) // 128 + 1) * 128
        # Slot-major, same as CausalKVAttention (uniform rule for the mesh
        # sharding: every 4-D state leaf is [B, slots, H, d]).
        shape = (batch_size, capacity, self.num_heads, self.head_dim)
        return {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}

    def __call__(
        self,
        params: Params,
        x: jnp.ndarray,  # [B, T, E]
        state: State,
        positions: jnp.ndarray,  # int32 [B, T]: absolute positions of x
        rope_cache: tuple | None = None,
    ) -> tuple[jnp.ndarray, State]:
        B, T, _ = x.shape
        capacity = state["k"].shape[1]
        assert capacity >= self.context + T, "ring must retain a full window plus the new chunk"
        pos = positions[:, 0]

        projected = qkv_proj(x, params["in_proj"]["weight"])
        q, k, v = _split_qkv(projected, self.num_heads)

        q, k = apply_rope(q, k, positions, self.max_period, rope_cache=rope_cache)

        # Shift-append ring: the cache stays ordered oldest -> newest, so the
        # update is a static slice + concat (contiguous copies, no gather or
        # scatter — those lower catastrophically on TPU for this shape).
        # Slot j then holds absolute position (pos + T) - capacity + j.
        # Slot-major: k/v stay [B, T, H, d]; the shift is ONE contiguous move.
        k_cache = jnp.concatenate([state["k"][:, T:], k.astype(state["k"].dtype)], axis=1)
        v_cache = jnp.concatenate([state["v"][:, T:], v.astype(state["v"].dtype)], axis=1)

        q = q.transpose(0, 2, 1, 3)  # [B, H, T, d]
        out = self._banded_sdpa(q, k_cache, v_cache, pos, positions)

        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.embed_dim)
        return linear(out, params["out_proj"]["weight"]), {"k": k_cache, "v": v_cache}

    _QBLOCK = 128  # query-block length of the banded decode attention

    def _banded_sdpa(self, q, k_cache, v_cache, pos, positions):
        """Windowed attention over the ring, computed in query blocks.

        Only a `context`-wide band of each query's scores row is live, but
        the dense form materializes the full [B, H, T, cap] f32 scores —
        ~1 GB/chunk at the batch-64 vocoder shape (T=512, cap=896), the
        dominant codec-transformer traffic. Blocking queries into 128-row
        tiles and slicing each tile's (context + 128)-wide key window cuts
        the scores to [B, H, T, W] with W = 384 at context 250. Masked
        entries underflow to exactly 0.0 in the f32 softmax, so the banded
        output is BITWISE-equal to the dense form (tests/test_attention.py).
        """
        B, H, T, d = q.shape
        capacity = k_cache.shape[1]
        Q = self._QBLOCK
        W = ((self.context - 1 + Q) + 127) // 128 * 128
        base = pos + T - capacity  # absolute position held by slot 0

        def block(qb, kb, vb, qpos_b, s):
            slot_pos_b = base[:, None] + s + jnp.arange(W, dtype=jnp.int32)[None, :]
            delta = qpos_b[:, :, None] - slot_pos_b[:, None, :]  # [B, Qb, W]
            valid = (slot_pos_b[:, None, :] >= 0) & (delta >= 0) & (delta < self.context)
            return _sdpa_slots(qb, kb, vb, valid[:, None])

        if T % Q or W >= capacity:
            # Short chunks (warmup frames, single-frame serving) and tiny
            # rings: the dense form is already small.
            slot_pos = base[:, None] + jnp.arange(capacity, dtype=jnp.int32)[None, :]
            delta = positions[:, :, None] - slot_pos[:, None, :]  # [B, T, cap]
            valid = (slot_pos[:, None, :] >= 0) & (delta >= 0) & (delta < self.context)
            return _sdpa_slots(q, k_cache, v_cache, valid[:, None])

        outs = []
        for i in range(T // Q):
            # Key window ending at the newest slot this block may see; the
            # clamp keeps it in range, masking keeps it exact.
            s = max(0, min(capacity - W, capacity - T + (i + 1) * Q - W))
            outs.append(
                block(
                    lax.slice_in_dim(q, i * Q, (i + 1) * Q, axis=2),
                    lax.slice_in_dim(k_cache, s, s + W, axis=1),
                    lax.slice_in_dim(v_cache, s, s + W, axis=1),
                    lax.slice_in_dim(positions, i * Q, (i + 1) * Q, axis=1),
                    s,
                )
            )
        return jnp.concatenate(outs, axis=2)

    def forward(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Non-streaming windowed attention over a full sequence [B, T, E]
        (used by the Mimi encoder during voice cloning; reference:
        pocket_tts_mlx/modules/attention.py:210-213 with model_state=None)."""
        B, T, _ = x.shape
        projected = qkv_proj(x, params["in_proj"]["weight"])
        q, k, v = _split_qkv(projected, self.num_heads)
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
        q, k = apply_rope(q, k, positions, self.max_period)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        idx = jnp.arange(T, dtype=jnp.int32)
        delta = idx[:, None] - idx[None, :]
        valid = (delta >= 0) & (delta < self.context)
        out = _sdpa(q, k, v, valid[None, None])
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.embed_dim)
        return linear(out, params["out_proj"]["weight"])

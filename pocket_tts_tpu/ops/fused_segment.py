"""Pallas TPU whole-SEGMENT decode kernel: S autoregressive FlowLM frames —
(latent/BOS select -> input projection -> 6 backbone layers -> out_norm ->
EOS logit -> flow-matching ODE step -> latent feedback) — as ONE Mosaic
program.

Why: after the head-folded per-frame kernel (ops/fused_backbone.py), the
remaining per-frame cost outside the kernel is the flow ODE head (~10 small
XLA fusions reading ~36 MB of f32 weights), the scan step machinery, and
the pallas launch itself. The decode step is launch-count bound
(BENCHMARKS.md scan-skeleton floor), so the only way to remove those is to
put the whole serial region — S frames of it — inside one kernel. The
weight traffic per frame is unchanged (it IS the roofline); everything
else amortizes over the segment:

  - grid (S, 52): 42 backbone phases (6 layers x 7 "pair" phases, 2 MiB
    int8 blocks — the pair layout leaves the most VMEM headroom) + 10 flow
    phases (2 MiB bf16 chunks of the SimpleMLPAdaLN weights, packed at
    load by pack_flow_bf16).
  - KV appends go STRAIGHT to the HBM cache buffers (aliased, ANY-space
    outputs) with dynamic-offset async copies at row widx0+s; attention
    masks rows by (slot_pos valid) OR (row in [widx0, widx0+s)) — no
    staging buffers, no segment-end flush, state layout identical to the
    XLA path. The write is waited before any later read of that layer.
  - The flow head runs on bf16 weight chunks with f32 accumulation — the
    same arithmetic the XLA path uses on TPU under "default" matmul
    precision (the f32 weights take bf16 MXU passes there too). The
    timestep embeddings depend only on the (static) Euler schedule, so
    they are precomputed at pack time.

DEFAULT ON (POCKET_TTS_FUSED_SEGMENT=0 opts out; see
fused_segment_enabled below): it passed the on-device parity gate at both
serving buckets and beat the per-frame kernel + scan end-to-end. The
per-frame kernel + lax.scan path remains the fallback (per-bucket compile
probe degrades to it) and the correctness oracle
(tests/test_fused_segment.py pins parity in interpret mode).

Reference behavior covered: pocket_tts_mlx/models/flow_lm.py:31-142 (the
per-frame decode semantics) + pocket_tts_mlx/modules/mlp.py:53-168 (the
AdaLN velocity net) — redesigned as one TPU program, not translated.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pocket_tts_tpu.ops.fused_backbone import (
    _NCHUNK,
    _layer_norm_f32,
    _pair_index,
    _tri_index,
    _erf,
    pack_backbone_head,  # noqa: F401  (re-export for callers)
)
from pocket_tts_tpu.utils.env import env_flag

_NEG_INF = -1e9
_PHASES = {"pair": 7, "tri": 4}  # backbone phases per layer, by block mode
_FLOW_PHASES = 10
_MC = 512  # flow model_channels the packing hardcodes (b6369a24)


def segment_block_candidates(kv_bytes: int) -> list[str]:
    """Static block preference order for the segment kernel: "tri" (3 MiB
    blocks, 34 grid steps/frame) wherever it fits next to the 4 MiB flow
    double-buffer — the measured hardware winner (single-stream 154.7x vs
    147.4x for the per-frame kernel + scan, scripts/measure_all.sh) —
    then "pair" (2 MiB blocks, 52 steps/frame, ~2 MiB more VMEM headroom).
    POCKET_TTS_FUSED_SEGMENT_BLOCK=pair forces the safe layout. The
    load-time probe walks this list per capacity bucket and records what
    actually compiles (fused_backbone.record_bucket_mode)."""
    import os

    v = (
        os.environ.get("POCKET_TTS_FUSED_SEGMENT_BLOCK", "tri") or "tri"
    ).strip().lower()
    if v == "tri" and kv_bytes <= 2 * 1024 * 1024:
        return ["tri", "pair"]
    return ["pair"]


def segment_block_mode(kv_bytes: int, capacity: int | None = None) -> str:
    """Resolve the segment kernel's block for a bucket: the probed verdict
    (ground truth from an actual compile) when present, else the static
    preference's head."""
    if capacity is not None:
        from pocket_tts_tpu.ops.fused_backbone import _UNPROBED, bucket_mode

        probed = bucket_mode("segment", capacity)
        if probed is not _UNPROBED and probed is not None:
            return probed
    return segment_block_candidates(kv_bytes)[0]


def fused_segment_enabled() -> bool:
    """Whole-segment kernel, DEFAULT ON (POCKET_TTS_FUSED_SEGMENT=0 opts
    out) since it passed the on-device parity gate at both serving buckets
    and beat the per-frame kernel + scan end-to-end (single-stream 154.7x
    vs 147.4x, TTFA p50 39 vs 57 ms — measurements/20260818T221401). The
    load-time compile probe (models/tts_model._probe_fused_compile)
    degrades to the per-frame kernel on any backend that rejects it."""
    return env_flag("POCKET_TTS_FUSED_SEGMENT", True)


# ---------------------------------------------------------------------------
# Flow-weight packing: uniform [1024, 1024] bf16 chunks (2 MiB), addressed as
# [512, 512] quadrants. Stream order follows the dataflow so each phase's
# operands arrive exactly one phase ahead:
#   chunk 0: quadrants (Wc^T upper, Wc^T lower, Win^T, params)
#   chunks 1-5: Wa^T (20 quadrants, 4 per chunk) — the AdaLN modulation stack
#   chunks 6-8: res-block MLPs (W0_i^T, W2_i^T interleaved, 2 blocks/chunk)
#   chunk 9: (Wf^T, 0, 0, 0)
# The params quadrant rows (copied to scratch at phase 0):
#   row 0: b_in | row 1: b_c | row 2: tcomb (precomputed timestep emb)
#   rows 3..22: b_a (20 segments of 512)
#   rows 24+4i..27+4i: block i's (ln_w, ln_b, b0, b2)
#   row 48: b_f (out bias, zero-padded past ldim)
#   row 49: final-LN has no params (affine-free) — unused
# ---------------------------------------------------------------------------


def _time_embedding(te_params, t_val: float) -> jnp.ndarray:
    """One sinusoidal timestep embedding at a STATIC t (ops/adaln
    TimestepEmbedder math, f32) -> [MC]."""
    half = 128  # frequency_embedding_size 256 // 2
    freqs = jnp.exp(
        -math.log(10_000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = jnp.float32(t_val) * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)])[None, :]
    w0, b0 = te_params["mlp"][0]["weight"], te_params["mlp"][0]["bias"]
    w2, b2 = te_params["mlp"][2]["weight"], te_params["mlp"][2]["bias"]
    x = emb @ w0.astype(jnp.float32).T + b0.astype(jnp.float32)[None, :]
    x = jax.nn.silu(x)
    x = x @ w2.astype(jnp.float32).T + b2.astype(jnp.float32)[None, :]
    alpha = te_params["mlp"][3]["alpha"].astype(jnp.float32)
    n = x.shape[-1]
    ss = jnp.sum(x * x, axis=-1, keepdims=True)
    # ddof=1 RMSNorm (ops/norms.rms_norm_ddof1, eps=1e-5)
    return (x * jax.lax.rsqrt(ss / (n - 1) + 1e-5) * alpha)[0]


def pack_flow_bf16(flow_net_params: dict) -> dict:
    """Pack the SimpleMLPAdaLN weights for in-kernel streaming. Requires the
    b6369a24 flow geometry (model_channels=512, depth=6, cond=1024,
    ldim<128 — the kernel parks the EOS logit at lane `ldim` of the
    128-lane latent row, so that lane must exist and be spare,
    num_time_conds=2, lsd_decode_steps=1) — callers fall back to the scan
    path otherwise. Returns {"fchunks": bf16 [10, 1024, 1024],
    "fparams": f32 [512, 512]}."""
    p = flow_net_params
    wc = p["cond_embed"]["weight"]  # [512, 1024]
    wa_mods = [b["adaLN_modulation"][1] for b in p["res_blocks"]] + [
        p["final_layer"]["adaLN_modulation"][1]
    ]
    wa = jnp.concatenate([m["weight"] for m in wa_mods], axis=0)  # [10240, 512]
    ba = jnp.concatenate([m["bias"] for m in wa_mods], axis=0)
    win = p["input_proj"]["weight"]  # [512, ldim]
    wf = p["final_layer"]["linear"]["weight"]  # [ldim, 512]
    depth = len(p["res_blocks"])
    mc = wc.shape[0]
    ldim = win.shape[1]
    if mc != _MC or depth != 6 or wc.shape[1] != 1024 or ldim >= 128:
        raise ValueError(
            f"fused segment supports flow(dim=512, depth=6, cond=1024, "
            f"ldim<128); got dim={mc}, depth={depth}, cond={wc.shape[1]}, "
            f"ldim={ldim}"
        )
    if wa.shape != (20 * _MC, _MC):
        raise ValueError(f"unexpected modulation stack {tuple(wa.shape)}")

    def q(x):  # [in<=512, out<=512] -> bf16 [512, 512] zero-padded
        x = jnp.asarray(x, jnp.float32).astype(jnp.bfloat16)
        return jnp.zeros((_MC, _MC), jnp.bfloat16).at[: x.shape[0], : x.shape[1]].set(x)

    f32 = jnp.float32
    tcomb = (
        _time_embedding(p["time_embed"][0], 0.0)
        + _time_embedding(p["time_embed"][1], 1.0)
    ) / 2.0  # [512] — the whole (s=0, t=1) Euler step's timestep conditioning

    params = jnp.zeros((_MC, _MC), f32)
    params = params.at[0, :].set(p["input_proj"]["bias"].astype(f32))
    params = params.at[1, :].set(p["cond_embed"]["bias"].astype(f32))
    params = params.at[2, :].set(tcomb)
    for seg in range(20):
        params = params.at[3 + seg, :].set(ba[seg * _MC : (seg + 1) * _MC].astype(f32))
    for i, blk in enumerate(p["res_blocks"]):
        r = 24 + 4 * i
        params = params.at[r + 0, :].set(blk["in_ln"]["weight"].astype(f32))
        params = params.at[r + 1, :].set(blk["in_ln"]["bias"].astype(f32))
        params = params.at[r + 2, :].set(blk["mlp"][0]["bias"].astype(f32))
        params = params.at[r + 3, :].set(blk["mlp"][2]["bias"].astype(f32))
    params = params.at[48, :ldim].set(p["final_layer"]["linear"]["bias"].astype(f32))

    wct = wc.astype(f32).T  # [1024, 512]
    quads = [
        q(wct[:_MC]),  # (0,0) Wc^T upper
        q(wct[_MC:]),  # (0,1) Wc^T lower
        q(win.astype(f32).T),  # (1,0) Win^T [ldim, 512]
        q(params.astype(jnp.bfloat16)),  # placeholder; params ride separately
    ]
    wat = wa.astype(f32).T  # [512, 10240]
    for seg in range(20):  # chunks 1-5
        quads.append(q(wat[:, seg * _MC : (seg + 1) * _MC]))
    for i in range(depth):  # chunks 6-8
        quads.append(q(p["res_blocks"][i]["mlp"][0]["weight"].astype(f32).T))
        quads.append(q(p["res_blocks"][i]["mlp"][2]["weight"].astype(f32).T))
    quads.append(q(wf.astype(f32).T))  # chunk 9 (Wf^T [512, ldim])
    while len(quads) % 4:
        quads.append(jnp.zeros((_MC, _MC), jnp.bfloat16))
    nchunk = len(quads) // 4
    assert nchunk == _FLOW_PHASES, nchunk
    chunks = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.concatenate(quads[4 * c : 4 * c + 2], axis=1),
                    jnp.concatenate(quads[4 * c + 2 : 4 * c + 4], axis=1),
                ],
                axis=0,
            )
            for c in range(nchunk)
        ]
    )  # [10, 1024, 1024] bf16
    return {
        "fchunks": jax.device_put(chunks),
        # f32 params ride as their own small input (bf16 rounding the ada
        # biases/LN params would be a needless deviation from the oracle).
        "fparams": jax.device_put(params),
    }


def _silu(x):
    return x * (1.0 / (1.0 + jnp.exp(-x)))


# NOTE: the backbone phase bodies below deliberately mirror
# fused_backbone._kernel (matmul_chunk, rope, flat-row head slices, attention, FF) —
# the two kernels close over different ref sets, so sharing the bodies would
# couple their layouts. ANY numerics change to one MUST be mirrored in the
# other; the parity tests tie both to the same XLA oracle.


def _seg_kernel(
    sc_ref,  # scalar prefetch [3] int32: (qpos0, widx0, is_bos0)
    # --- tensor inputs ---
    hx_ref,  # [8, 128] f32 — row 0 = the carry latent, zero-padded
    win_ref,  # [128, E] bf16 — input_linear^T (pack_backbone_head)
    hw_ref,  # [8, E] f32 — head constants (pack_backbone_head)
    w_ref,  # [1, 2, E, E] int8 — backbone weight pair (TRANSPOSED [in, out])
    s_ref,  # [1, 12, E] f32 — per-chunk output scales
    ln_ref,  # [1, 4, E] f32 — per-layer LN params
    cf_ref,  # [8, E] f32 — rope cos rows for this frame GROUP (row s % 8)
    sf_ref,  # [8, E] f32
    noise_ref,  # [8, MC] f32 — flow starting noise rows (lanes >= ldim zero)
    f_ref,  # [1, 2*MC, 2*MC] bf16 — current flow chunk (4 quadrants)
    fp_ref,  # [64, MC] f32 — flow biases / LN params / tcomb (pack_flow_bf16)
    sp_ref,  # [1, C] int32 — slot positions (pre-segment)
    *refs,
    num_layers: int,
    num_heads: int,
    head_dim: int,
    cache_dtype,
    seg_frames: int,
    ldim: int,
    block: str,
):
    L = num_layers
    (k_hbm, v_hbm) = refs[:L], refs[L : 2 * L]
    lat_ref = refs[2 * L]  # [8, 128] f32 out block (frame GROUP's latents + eos)
    spnew_ref = refs[2 * L + 1]  # [1, C] int32 out (aliased)
    ko = refs[2 * L + 2 : 2 * L + 2 + L]  # HBM (C, E) outs aliased to k_hbm
    vo = refs[2 * L + 2 + L : 2 * L + 2 + 2 * L]
    (
        x_s, lnx_s, qrow_s, h1_s, yacc_s, kv_k, kv_v,
        lat_s, h_s, ada_s, fx_s, fy_s,
        krow_s, vrow_s, kblk_s, vblk_s, cfrow_s,
        sem_k, sem_v, sem_w,
    ) = refs[2 * L + 2 + 2 * L :]

    s = pl.program_id(0)
    p = pl.program_id(1)
    E = win_ref.shape[1]
    H, d = num_heads, head_dim
    MC = _MC
    C = sp_ref.shape[1]
    qpos = sc_ref[0] + s
    # Clamped like dynamic_update_slice clamps its start index: the caller's
    # bucket budgeting guarantees widx0 + S <= C, but an out-of-range DMA
    # offset would corrupt memory rather than clamp.
    widx = jnp.minimum(sc_ref[1] + s, C - 1)

    nph = _PHASES[block]
    pb = jnp.minimum(p, 6 * nph - 1)
    l = pb // nph
    sub = pb % nph
    in_backbone = p < 6 * nph
    fp = p - 6 * nph  # flow phase id (valid when >= 0)

    def matmul_chunk(xrow, j, srow):
        w = w_ref[0, j].astype(jnp.bfloat16)
        y = jnp.dot(xrow.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
        return y * s_ref[0, srow, :][None, :]

    def rope(x):
        # This frame's rope rows were extracted into scratch at layer 0
        # (the (8, E) input block covers the whole frame GROUP; Mosaic
        # forbids (1, E) second-minor blocks on hardware).
        cf = cfrow_s[0][None, :]
        sf = cfrow_s[1][None, :]
        n = x.shape[1]
        left = pltpu.roll(x, shift=n - 1, axis=1)
        right = pltpu.roll(x, shift=1, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
        swapped = jnp.where(lane % 2 == 0, -left, right)
        return x * cf + swapped * sf

    # Per-head values are read as STATIC 64-lane column slices of FLAT
    # head-major rows (qrow_s / krow_s / vrow_s) — the same probe-P2 pattern
    # the cache reads use; no [H, d] head scratches (see fused_backbone).

    def quad(r, c):
        return f_ref[0, r * MC : (r + 1) * MC, c * MC : (c + 1) * MC]

    def quad_i(idx):  # local quadrant index 0..3 -> (row, col) slice
        return quad(idx // 2, idx % 2)

    # ---------------- backbone phase bodies (pair layout) -----------------
    def body_layer_start():
        @pl.when(l == 0)
        def _():
            # Extract THIS frame's rope rows from the (8, E) group block
            # (row s % 8) — shared by every layer's rope below.
            rows_e = jax.lax.broadcasted_iota(jnp.int32, (8, E), 0)
            frow = s % 8
            cfrow_s[0:1, :] = jnp.sum(
                jnp.where(rows_e == frow, cf_ref[:, :], 0.0), axis=0, keepdims=True
            )
            cfrow_s[1:2, :] = jnp.sum(
                jnp.where(rows_e == frow, sf_ref[:, :], 0.0), axis=0, keepdims=True
            )
            # Input projection from the recurrent latent (frame 0 selects
            # carry latent vs BOS; later frames read the flow output).
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            bos8 = jnp.where(rows == 0, hw_ref[5, 0:128][None, :], 0.0)
            first = jnp.where(sc_ref[2] == 1, bos8, hx_ref[:, :])
            src = jnp.where(s == 0, first, lat_s[:, :])
            x_s[:, :] = (
                jnp.dot(
                    src.astype(jnp.bfloat16), win_ref[:, :],
                    preferred_element_type=jnp.float32,
                )
                * hw_ref[4, :][None, :]
            )

        # Layer 0's cache DMA starts here ONLY at the segment's first frame;
        # every later frame's layer-0 fetch was already issued by the
        # cross-frame prefetch at (s-1, layer 5) — a second start on the
        # same semaphore would desynchronize it.
        @pl.when((l == 0) & (s == 0))
        def _():
            # All cache READS go through the aliased OUTPUT refs (same HBM
            # buffer as the inputs on hardware): later frames must see the
            # rows this kernel appended, and interpret mode only propagates
            # writes through the output-side buffer.
            pltpu.make_async_copy(ko[0], kv_k, sem_k).start()
            pltpu.make_async_copy(vo[0], kv_v, sem_v).start()

        lnx_s[:, :] = _layer_norm_f32(
            x_s[:, :], ln_ref[0, 0][None, :], ln_ref[0, 1][None, :]
        )

    def body_qk(jq, jk):
        qrow_s[:, :] = rope(matmul_chunk(lnx_s[:, :], jq, 0))
        k_rot = rope(matmul_chunk(lnx_s[:, :], jk, 1))
        # Stash the flat new-k row (cache dtype — the rounding the append
        # applies) for the aligned append block below; the attention
        # self-term reads its head slices.
        krow_s[:, :] = k_rot.astype(cache_dtype)

    def body_v_append(jv):
        v = matmul_chunk(lnx_s[:, :], jv, 2)
        vrow_s[:, :] = v.astype(cache_dtype)
        # Append this layer's new (k, v) row into the aliased HBM (C, E)
        # caches at row widx. Mosaic's tile rules forbid single-row HBM
        # slices, so the write is an aligned 8-row read-modify-write
        # (scripts/mosaic_probe.py P1): fetch the neighbor block, substitute
        # the new row at widx % 8, write it back. The waits keep every later
        # read of this layer ordered behind the write; rows != widx are
        # rewritten byte-identical, and row widx is masked out of THIS
        # frame's attention (strict '< widx') — the current frame enters
        # the softmax algebraically instead.
        base = pl.multiple_of((widx // 8) * 8, 8)
        off = widx - base
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, E), 0)
        wsl = pl.ds(base, 8)
        for i in range(L):
            @pl.when(l == i)
            def _(i=i):
                cp = pltpu.make_async_copy(ko[i].at[wsl, :], kblk_s, sem_w)
                cp.start()
                cp.wait()
                cp = pltpu.make_async_copy(vo[i].at[wsl, :], vblk_s, sem_w)
                cp.start()
                cp.wait()
        kblk_s[:, :] = jnp.where(rows8 == off, krow_s[0, :][None, :], kblk_s[:, :])
        vblk_s[:, :] = jnp.where(rows8 == off, vrow_s[0, :][None, :], vblk_s[:, :])
        for i in range(L):
            @pl.when(l == i)
            def _(i=i):
                cp = pltpu.make_async_copy(kblk_s, ko[i].at[wsl, :], sem_w)
                cp.start()
                cp.wait()
                cp = pltpu.make_async_copy(vblk_s, vo[i].at[wsl, :], sem_w)
                cp.start()
                cp.wait()

    def body_attn_out(jo):
        pltpu.make_async_copy(k_hbm[0], kv_k, sem_k).wait()
        pltpu.make_async_copy(v_hbm[0], kv_v, sem_v).wait()
        rows_c = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        # Valid = pre-segment history (slot_pos) OR rows appended by EARLIER
        # frames of this segment (their stale slot_pos is -1 or >= qpos0).
        valid = (
            (sp_ref[0][:, None] >= 0) & (sp_ref[0][:, None] < qpos)
        ) | ((rows_c >= sc_ref[1]) & (rows_c < widx))
        scale = 1.0 / math.sqrt(d)
        for h in range(H):
            # Head h reads STATIC 64-lane column slices of the (C, E)
            # slot-major cache copy and the flat head-major rows
            # (scripts/mosaic_probe.py P2).
            hs = slice(h * d, (h + 1) * d)
            q_h = qrow_s[0, hs].astype(cache_dtype)
            k_h = kv_k[:, hs]
            v_h = kv_v[:, hs]
            scores = (
                jnp.sum(
                    k_h.astype(jnp.float32) * q_h.astype(jnp.float32)[None, :],
                    axis=1,
                    keepdims=True,
                )
                * scale
            )
            scores = jnp.where(valid, scores, _NEG_INF)
            s_self = (
                jnp.sum(
                    q_h.astype(jnp.float32)
                    * krow_s[0, hs].astype(jnp.float32)
                )
                * scale
            )
            m = jnp.maximum(jnp.max(scores), s_self)
            e = jnp.exp(scores - m)
            e_self = jnp.exp(s_self - m)
            denom = jnp.sum(e) + e_self
            w = (e / denom).astype(cache_dtype)
            out = jnp.sum(w.astype(jnp.float32) * v_h.astype(jnp.float32), axis=0)
            w_self = (e_self / denom).astype(cache_dtype).astype(jnp.float32)
            v_self = vrow_s[0, hs].astype(jnp.float32)
            # This head's output lanes of the flat attention row, written
            # directly (yacc_s is free at this phase; only row 0 is read).
            yacc_s[0, hs] = out + w_self * v_self
        acc = matmul_chunk(yacc_s[:, :], jo, 3)
        x_s[0, :] = x_s[0, :] + acc[0]
        lnx_s[:, :] = _layer_norm_f32(
            x_s[:, :], ln_ref[0, 2][None, :], ln_ref[0, 3][None, :]
        )

    def body_prefetch_next_kv():
        # Layer l+1 for this frame; at the last layer, layer 0 for the NEXT
        # frame (its frame-s append completed back at (s, 0) — the wait in
        # body_v_append ordered it). No prefetch after the LAST frame's last
        # layer: an un-awaited DMA at kernel exit trips the semaphore check.
        for i in range(L - 1):
            @pl.when(l == i)
            def _(i=i):
                pltpu.make_async_copy(ko[i + 1], kv_k, sem_k).start()
                pltpu.make_async_copy(vo[i + 1], kv_v, sem_v).start()

        @pl.when((l == L - 1) & (s < seg_frames - 1))
        def _():
            pltpu.make_async_copy(ko[0], kv_k, sem_k).start()
            pltpu.make_async_copy(vo[0], kv_v, sem_v).start()

    def body_ff1(pairs):
        for c, j in pairs:
            hcol = matmul_chunk(lnx_s[:, :], j, 4 + c)
            hcol = 0.5 * hcol * (1.0 + _erf(hcol * 0.7071067811865476))
            h1_s[:, c * E : (c + 1) * E] = hcol.astype(jnp.bfloat16)

    def body_ff2(pairs):
        for c, j in pairs:
            part = jnp.dot(
                h1_s[:, c * E : (c + 1) * E],
                w_ref[0, j].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            if c == 0:
                yacc_s[:, :] = part
            else:
                yacc_s[:, :] = yacc_s[:, :] + part

    def body_tail():
        x_s[0, :] = x_s[0, :] + yacc_s[0, :] * s_ref[0, 8, :]

        @pl.when(l == L - 1)
        def _():
            # Head epilogue: out_norm + EOS logit (rows: 0 = h, 1 = eos).
            hn = _layer_norm_f32(
                x_s[:, :], hw_ref[0, :][None, :], hw_ref[1, :][None, :]
            )
            h_s[:, :] = hn
            h_s[1, :] = jnp.sum(hn[0, :] * hw_ref[2, :]) + hw_ref[3, :]

    # ---------------- flow phase bodies (see pack_flow_bf16 layout) -------
    def flow_p0():
        # chunk 0: Wc^T upper (0,0) / lower (0,1), Win^T (1,0).
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, MC), 0)
        nrow = jnp.sum(
            jnp.where(rows == s % 8, noise_ref[:, :], 0.0), axis=0
        )  # this frame's noise row out of the (8, MC) group block
        noise8 = jnp.where(rows == 0, nrow[None, :], 0.0)
        fy_s[:, :] = noise8  # stash x0 for the Euler update (fy free until y)
        xp = (
            jnp.dot(
                noise8.astype(jnp.bfloat16), quad(1, 0),
                preferred_element_type=jnp.float32,
            )
            + fp_ref[0, :][None, :]
        )
        fx_s[:, :] = xp
        y = (
            jnp.dot(
                h_s[:, :MC].astype(jnp.bfloat16), quad(0, 0),
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(
                h_s[:, MC:].astype(jnp.bfloat16), quad(0, 1),
                preferred_element_type=jnp.float32,
            )
            + fp_ref[1, :][None, :]
            + fp_ref[2, :][None, :]  # tcomb (precomputed timestep embedding)
        )
        ada_s[:, 20 * MC : 21 * MC] = _silu(y)  # stash silu(y) in the spare col

    def flow_ada(c):  # chunks 1-5: 4 modulation segments each
        sy = ada_s[:, 20 * MC : 21 * MC]
        for j in range(4):
            seg = (c - 1) * 4 + j
            ada_s[:, seg * MC : (seg + 1) * MC] = (
                jnp.dot(
                    sy.astype(jnp.bfloat16), quad_i(j),
                    preferred_element_type=jnp.float32,
                )
                + fp_ref[3 + seg, :][None, :]
            )

    def flow_blocks(c):  # chunks 6-8: res blocks 2(c-6) and 2(c-6)+1
        for k in range(2):
            i = (c - 6) * 2 + k
            r = 24 + 4 * i
            base = i * 3 * MC
            shift = ada_s[0, base : base + MC][None, :]
            scal = ada_s[0, base + MC : base + 2 * MC][None, :]
            gate = ada_s[0, base + 2 * MC : base + 3 * MC][None, :]
            n = _layer_norm_f32(
                fx_s[:, :], fp_ref[r, :][None, :], fp_ref[r + 1, :][None, :],
                eps=1e-6,
            )
            m = n * (1.0 + scal) + shift
            u = (
                jnp.dot(
                    m.astype(jnp.bfloat16), quad_i(2 * k),
                    preferred_element_type=jnp.float32,
                )
                + fp_ref[r + 2, :][None, :]
            )
            u = _silu(u)
            u = (
                jnp.dot(
                    u.astype(jnp.bfloat16), quad_i(2 * k + 1),
                    preferred_element_type=jnp.float32,
                )
                + fp_ref[r + 3, :][None, :]
            )
            fx_s[:, :] = fx_s[:, :] + gate * u

    def flow_final():
        base = 18 * MC
        shift = ada_s[0, base : base + MC][None, :]
        scal = ada_s[0, base + MC : base + 2 * MC][None, :]
        n = _layer_norm_f32(
            fx_s[:, :],
            jnp.ones((1, MC), jnp.float32),
            jnp.zeros((1, MC), jnp.float32),
            eps=1e-6,
        )
        m = n * (1.0 + scal) + shift
        v = (
            jnp.dot(
                m.astype(jnp.bfloat16), quad(0, 0),
                preferred_element_type=jnp.float32,
            )
            + fp_ref[48, :][None, :]
        )
        newlat = fy_s[:, :] + v  # Euler from x0 (stashed noise), num_steps=1
        lat_s[:, :] = newlat[:, :128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        val = jnp.where(
            lane == ldim, h_s[1, :128][None, :], newlat[0:1, :128]
        )  # [1, 128] — this frame's latent row + eos logit at lane ldim
        # The output block covers the 8-frame GROUP (Mosaic forbids (1, 128)
        # second-minor blocks); write row s % 8, leave the siblings alone —
        # each is written exactly once before the block flushes.
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lat_ref[:, :] = jnp.where(rows8 == s % 8, val, lat_ref[:, :])

        @pl.when(s == seg_frames - 1)
        def _():
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
            inseg = (lanes >= sc_ref[1]) & (lanes < sc_ref[1] + seg_frames)
            spnew_ref[0:1, :] = jnp.where(
                inseg, sc_ref[0] + (lanes - sc_ref[1]), sp_ref[0:1, :]
            )

    # ---------------- wire phases (mirrors fused_backbone's layouts) ------
    if block == "pair":
        @pl.when(in_backbone & (sub == 0))
        def _():
            body_layer_start()
            body_qk(0, 1)

        @pl.when(in_backbone & (sub == 1))
        def _():
            body_v_append(0)

        @pl.when(in_backbone & (sub == 2))
        def _():
            body_attn_out(1)

        @pl.when(in_backbone & (sub == 3))
        def _():
            body_prefetch_next_kv()
            body_ff1([(0, 0), (1, 1)])

        @pl.when(in_backbone & (sub == 4))
        def _():
            body_ff1([(2, 0), (3, 1)])

        @pl.when(in_backbone & (sub == 5))
        def _():
            body_ff2([(0, 0), (1, 1)])

        @pl.when(in_backbone & (sub == 6))
        def _():
            body_ff2([(2, 0), (3, 1)])
            body_tail()
    else:  # tri: 4 phases/layer, 3 MiB blocks, 24 backbone steps
        @pl.when(in_backbone & (sub == 0))
        def _():
            body_layer_start()
            body_qk(0, 1)
            body_v_append(2)

        @pl.when(in_backbone & (sub == 1))
        def _():
            body_attn_out(0)
            body_ff1([(0, 1), (1, 2)])

        @pl.when(in_backbone & (sub == 2))
        def _():
            body_prefetch_next_kv()
            body_ff1([(2, 0), (3, 1)])
            body_ff2([(0, 2)])

        @pl.when(in_backbone & (sub == 3))
        def _():
            body_ff2([(1, 0), (2, 1), (3, 2)])
            body_tail()

    @pl.when(fp == 0)
    def _():
        flow_p0()

    for _c in range(1, 6):
        @pl.when(fp == _c)
        def _(_c=_c):
            flow_ada(_c)

    for _c in range(6, 9):
        @pl.when(fp == _c)
        def _(_c=_c):
            flow_blocks(_c)

    @pl.when(fp == 9)
    def _():
        flow_final()


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret", "seg_frames", "block")
)
def fused_segment_decode(
    packed: dict,  # pack_backbone_int8 output (int8 chunks, scales, ln)
    head_packed: dict,  # pack_backbone_head output (win, hw)
    flow_packed: dict,  # pack_flow_bf16 output (fchunks, fparams)
    latent: jnp.ndarray,  # [1, ldim] f32 — carry latent entering the segment
    is_bos: jnp.ndarray,  # [1] bool — whole-generation BOS (frame 0 only)
    noise: jnp.ndarray,  # [S, ldim] f32 — pre-drawn flow noise (temp applied)
    k_caches: tuple,  # L x [1, C, H, d] slot-major cache dtype
    v_caches: tuple,
    slot_pos: jnp.ndarray,  # [1, C] int32 (pre-segment)
    qpos0: jnp.ndarray,  # [1] int32 — first frame's absolute position
    widx0: jnp.ndarray,  # [1] int32 — first frame's cache write index
    cos: jnp.ndarray,  # [S, d//2] f32 rope angles per frame
    sin: jnp.ndarray,
    num_heads: int = 16,
    interpret: bool = False,
    seg_frames: int = 8,
    block: str = "pair",  # "pair" (2 MiB, safest VMEM) | "tri" (3 MiB, C<=512)
):
    """Run S = seg_frames autoregressive decode frames in ONE Mosaic program
    -> (latents [S, ldim] f32, eos_logits [S] f32, k', v', slot_pos').

    The caches and slot_pos come back UPDATED in place (aliased buffers);
    the caller advances widx/pos by S. Oracle: S chained
    flow_lm.decode_step calls (tests/test_fused_segment.py).
    """
    L = len(k_caches)
    E = head_packed["win"].shape[1]
    H = num_heads
    d = E // H
    C = k_caches[0].shape[1]
    S = seg_frames
    ldim = latent.shape[-1]
    cache_dtype = k_caches[0].dtype
    assert noise.shape[0] == S and cos.shape[0] == S
    # The per-frame operand/latent blocks cover 8-frame groups (Mosaic
    # forbids (1, X) second-minor blocks on hardware).
    assert S % 8 == 0, f"seg_frames must be a multiple of 8; got {S}"

    scalars = jnp.concatenate(
        [qpos0.astype(jnp.int32), widx0.astype(jnp.int32), is_bos.astype(jnp.int32)]
    )
    # Rope rows for every frame of the segment, pair-repeated + head-tiled
    # (one vectorized op per segment, not per frame).
    cf = jnp.tile(jnp.repeat(cos.astype(jnp.float32), 2, axis=-1), (1, H))  # [S, E]
    sf = jnp.tile(jnp.repeat(sin.astype(jnp.float32), 2, axis=-1), (1, H))
    noise512 = jnp.zeros((S, _MC), jnp.float32).at[:, :ldim].set(
        noise.astype(jnp.float32)
    )
    hx = jnp.zeros((8, 128), jnp.float32).at[0, :ldim].set(
        latent[0].astype(jnp.float32)
    )

    kernel = functools.partial(
        _seg_kernel,
        num_layers=L,
        num_heads=H,
        head_dim=d,
        cache_dtype=cache_dtype,
        seg_frames=S,
        ldim=ldim,
        block=block,
    )

    # Caches ride as 2-D (C, E) slot-major views (free bitcast of the
    # [1, C, H, d] state layout), pinned to HBM on hardware so the aligned
    # 8-row append DMA is legal; interpret mode (CPU tests) keeps ANY.
    cache_space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    bph = _PHASES[block]
    nblk = {"pair": 2, "tri": 3}[block]
    blk_index = {"pair": _pair_index, "tri": _tri_index}[block]
    nph = 6 * bph + _FLOW_PHASES

    def wmap(s, p, _sc):
        pb = jnp.minimum(p, 6 * bph - 1)
        return (pb // bph, blk_index(pb % bph), 0, 0)

    def lmap(s, p, _sc):
        pb = jnp.minimum(p, 6 * bph - 1)
        return (pb // bph, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, nph),
        in_specs=[
            pl.BlockSpec((8, 128), lambda s, p, _sc: (0, 0)),  # hx
            pl.BlockSpec((128, E), lambda s, p, _sc: (0, 0)),  # win
            pl.BlockSpec((8, E), lambda s, p, _sc: (0, 0)),  # hw
            pl.BlockSpec((1, nblk, E, E), wmap),  # backbone int8 block
            pl.BlockSpec((1, _NCHUNK, E), lmap),  # scales
            pl.BlockSpec((1, 4, E), lmap),  # ln
            # Per-frame rows ride in 8-row GROUP blocks (Mosaic forbids
            # (1, X) second-minor blocks); the kernel selects row s % 8.
            pl.BlockSpec((8, E), lambda s, p, _sc: (s // 8, 0)),  # cf
            pl.BlockSpec((8, E), lambda s, p, _sc: (s // 8, 0)),  # sf
            pl.BlockSpec((8, _MC), lambda s, p, _sc: (s // 8, 0)),  # noise
            pl.BlockSpec(
                (1, 2 * _MC, 2 * _MC),
                lambda s, p, _sc: (
                    jnp.clip(p - 6 * bph, 0, _FLOW_PHASES - 1),
                    0,
                    0,
                ),
            ),  # flow chunk
            pl.BlockSpec((64, _MC), lambda s, p, _sc: (0, 0)),  # flow params
            pl.BlockSpec((1, C), lambda s, p, _sc: (0, 0)),  # slot_pos
        ]
        + [pl.BlockSpec(memory_space=cache_space)] * (2 * L),
        out_specs=[
            pl.BlockSpec((8, 128), lambda s, p, _sc: (s // 8, 0)),  # latent+eos
            pl.BlockSpec((1, C), lambda s, p, _sc: (0, 0)),  # slot_pos'
        ]
        + [pl.BlockSpec(memory_space=cache_space)] * (2 * L),
        scratch_shapes=[
            pltpu.VMEM((8, E), jnp.float32),  # x_s
            pltpu.VMEM((8, E), jnp.float32),  # lnx_s
            pltpu.VMEM((8, E), jnp.float32),  # qrow_s (flat roped q, row 0)
            pltpu.VMEM((8, 4 * E), jnp.bfloat16),  # h1_s
            pltpu.VMEM((8, E), jnp.float32),  # yacc_s
            pltpu.VMEM((C, E), cache_dtype),  # kv_k (slot-major, unpadded lanes)
            pltpu.VMEM((C, E), cache_dtype),  # kv_v
            pltpu.VMEM((8, 128), jnp.float32),  # lat_s (latent feedback)
            pltpu.VMEM((8, E), jnp.float32),  # h_s (out-norm'd h + eos row)
            pltpu.VMEM((8, 21 * _MC), jnp.float32),  # ada_s (+ silu(y) col)
            pltpu.VMEM((8, _MC), jnp.float32),  # fx_s (flow residual)
            pltpu.VMEM((8, _MC), jnp.float32),  # fy_s (stashed x0)
            pltpu.VMEM((8, E), cache_dtype),  # krow_s (flat new k row)
            pltpu.VMEM((8, E), cache_dtype),  # vrow_s
            pltpu.VMEM((8, E), cache_dtype),  # kblk_s (aligned append block)
            pltpu.VMEM((8, E), cache_dtype),  # vblk_s
            pltpu.VMEM((2, E), jnp.float32),  # cfrow_s (this frame's rope rows)
            pltpu.SemaphoreType.DMA,  # sem_k
            pltpu.SemaphoreType.DMA,  # sem_v
            pltpu.SemaphoreType.DMA,  # sem_w (append writes)
        ],
    )

    # Tensor operands: hx(1), win(2), hw(3), wch(4), wsc(5), ln(6), cf(7),
    # sf(8), noise(9), fch(10), fpar(11), sp(12), k_i(13+i), v_i(13+L+i).
    # Outputs: lat(0), sp'(1), k'(2+i), v'(2+L+i). Caches + slot_pos alias.
    aliases = {13 + i: 2 + i for i in range(L)}
    aliases.update({13 + L + i: 2 + L + i for i in range(L)})
    aliases[12] = 1
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
        ]
        + [jax.ShapeDtypeStruct((C, E), cache_dtype)] * (2 * L),
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        scalars,
        hx,
        head_packed["win"],
        head_packed["hw"],
        packed["wchunks"],
        packed["wscales"],
        packed["ln"],
        cf,
        sf,
        noise512,
        flow_packed["fchunks"],
        flow_packed["fparams"][:64],
        slot_pos,
        # [1, C, H, d] -> (C, E): a contiguous bitcast, so the in/out
        # aliasing stays copy-free under donation.
        *[k[0].reshape(C, E) for k in k_caches],
        *[v[0].reshape(C, E) for v in v_caches],
    )
    lat = outs[0]
    latents = lat[:, :ldim]
    eos_logits = lat[:, ldim]
    spnew = outs[1]
    new_ks = tuple(o.reshape(C, H, d) for o in outs[2 : 2 + L])
    new_vs = tuple(o.reshape(C, H, d) for o in outs[2 + L :])
    return latents, eos_logits, new_ks, new_vs, spnew

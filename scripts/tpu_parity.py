"""Real-device parity check: the COMPILED Mosaic megakernel vs the XLA
oracle path.

tests/test_fused_backbone.py pins kernel parity in Pallas interpret mode on
CPU; this script closes the remaining gap by compiling the actual Mosaic
program on the device (TPU under axon) and checking multi-step decode
parity — including the in-kernel KV cache append (aliased outputs), which
interpret mode models but only the real pipeline exercises with real DMA
ordering.

For each (attn_mode, block, capacity) variant: prefill the oracle, then run
8 consecutive decode steps through BOTH paths from the same state, carrying
each path's own caches — so a wrong in-place append shows up as divergence
on later steps, not just a bad first row.

Usage: python scripts/tpu_parity.py [--steps 8] [--atol 0.05]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

os.environ.setdefault("POCKET_TTS_OFFLINE", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

E, H, L = 1024, 16, 6


def build(C):
    from pocket_tts_tpu.models.weights import quantize_int8
    from pocket_tts_tpu.ops.fused_backbone import pack_backbone_int8
    from pocket_tts_tpu.ops.transformer import StreamingTransformer

    t = StreamingTransformer(
        d_model=E, num_heads=H, num_layers=L, dim_feedforward=4 * E, kind="flow_lm"
    )
    params = t.init_params(jax.random.PRNGKey(0))
    q = quantize_int8({"flow_lm": {"transformer": params}}, subtrees=("transformer",))
    qparams = q["flow_lm"]["transformer"]
    packed = pack_backbone_int8(qparams["layers"])
    state = t.init_state(1, C, dtype=jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 17, E), jnp.float32) * 0.3
    pos = jnp.arange(17, dtype=jnp.int32)[None, :]
    _, state = t(qparams, emb, state, pos)
    return t, qparams, packed, state


def run_variant(t, qparams, packed, state0, steps, attn_mode, block, atol):
    from pocket_tts_tpu.ops.fused_backbone import fused_backbone_decode
    from pocket_tts_tpu.ops.rope import rope_angles

    @jax.jit
    def oracle_step(x, state, positions):
        return t(qparams, x, state, positions)

    @jax.jit
    def kernel_step(x, state, positions):
        cos, sin = rope_angles(positions, E // H)
        widx = state["widx"]
        layers = state["layers"]
        y, new_ks, new_vs = fused_backbone_decode(
            packed,
            x[:, 0, :],
            tuple(l["k"] for l in layers),
            tuple(l["v"] for l in layers),
            layers[0]["slot_pos"],
            positions[:, 0],
            cos[0, 0, 0],
            sin[0, 0, 0],
            widx=jnp.reshape(widx, (1,)).astype(jnp.int32),
            num_heads=H,
            attn_mode=attn_mode,
            block=block,
        )
        new_layers = [
            {
                "k": new_ks[i][None],
                "v": new_vs[i][None],
                "slot_pos": jax.lax.dynamic_update_slice(
                    layers[i]["slot_pos"], positions, (0, widx)
                ),
            }
            for i in range(L)
        ]
        return y[:, None, :], {"layers": new_layers, "widx": widx + 1}

    s_ref, s_ker = state0, state0
    worst = 0.0
    for step in range(steps):
        x = jax.random.normal(jax.random.PRNGKey(100 + step), (1, 1, E), jnp.float32) * 0.5
        positions = jnp.full((1, 1), 17 + step, jnp.int32)
        ref_y, s_ref = oracle_step(x, s_ref, positions)
        ker_y, s_ker = kernel_step(x, s_ker, positions)
        err = float(np.abs(np.asarray(ker_y[0, 0]) - np.asarray(ref_y[0, 0])).max())
        worst = max(worst, err)
        if err > atol:
            return worst, f"step {step}: output diverged (max|diff|={err:.5f})"
    # Full-cache comparison at the end (history + appends + untouched tail).
    for i in range(L):
        for key in ("k", "v"):
            a = np.asarray(s_ker["layers"][i][key], np.float32)
            b = np.asarray(s_ref["layers"][i][key], np.float32)
            err = float(np.abs(a - b).max())
            worst = max(worst, err)
            if err > atol:
                return worst, f"layer {i} cache {key} diverged (max|diff|={err:.5f})"
    return worst, None


def build_head_params():
    ldim = 32
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    return {
        "input_linear": {
            "weight": jax.random.normal(ks[0], (E, ldim), jnp.float32) * 0.1
        },
        "out_norm": {
            "weight": 1.0 + 0.1 * jax.random.normal(ks[1], (E,), jnp.float32),
            "bias": 0.1 * jax.random.normal(ks[2], (E,), jnp.float32),
        },
        "out_eos": {
            "weight": jax.random.normal(ks[3], (1, E), jnp.float32) * 0.03,
            "bias": jnp.full((1,), 0.25, jnp.float32),
        },
        "bos_emb": jax.random.normal(ks[4], (ldim,), jnp.float32),
    }


def run_head_variant(t, qparams, packed, state0, steps, attn_mode, block, atol):
    """Compiled head-folded step (fused_backbone_step) vs the XLA head math
    around the oracle transformer, with each path carrying its own caches."""
    from pocket_tts_tpu.ops.fused_backbone import (
        fused_backbone_step,
        pack_backbone_head,
    )
    from pocket_tts_tpu.ops.linear import linear
    from pocket_tts_tpu.ops.norms import layer_norm
    from pocket_tts_tpu.ops.rope import rope_angles

    hp = build_head_params()
    head_packed = pack_backbone_head(hp)

    @jax.jit
    def oracle_step(latent, is_bos, state, positions):
        seq = jnp.where(is_bos[:, None], hp["bos_emb"][None, :], latent)
        x = linear(seq[:, None, :], hp["input_linear"]["weight"])
        h, st = t(qparams, x, state, positions)
        h = layer_norm(
            h, hp["out_norm"]["weight"], hp["out_norm"]["bias"], eps=1e-5
        ).astype(jnp.float32)[:, -1]
        eos = linear(h, hp["out_eos"]["weight"], hp["out_eos"]["bias"])[:, 0]
        return h, eos, st

    @jax.jit
    def kernel_step(latent, is_bos, state, positions):
        cos, sin = rope_angles(positions, E // H)
        widx = state["widx"]
        layers = state["layers"]
        h, eos, new_ks, new_vs, spnew = fused_backbone_step(
            packed,
            head_packed,
            latent,
            is_bos,
            tuple(l["k"] for l in layers),
            tuple(l["v"] for l in layers),
            layers[0]["slot_pos"],
            positions[:, 0],
            cos[0, 0, 0],
            sin[0, 0, 0],
            jnp.reshape(widx, (1,)).astype(jnp.int32),
            num_heads=H,
            attn_mode=attn_mode,
            block=block,
        )
        new_layers = [
            {"k": new_ks[i][None], "v": new_vs[i][None], "slot_pos": spnew}
            for i in range(L)
        ]
        return h, eos, {"layers": new_layers, "widx": widx + 1}

    s_ref, s_ker = state0, state0
    worst = 0.0
    for step in range(steps):
        latent = jax.random.normal(jax.random.PRNGKey(300 + step), (1, 32), jnp.float32)
        is_bos = jnp.full((1,), step == 0, jnp.bool_)
        positions = jnp.full((1, 1), 17 + step, jnp.int32)
        rh, re, s_ref = oracle_step(latent, is_bos, s_ref, positions)
        kh, ke, s_ker = kernel_step(latent, is_bos, s_ker, positions)
        err = max(
            float(np.abs(np.asarray(kh[0]) - np.asarray(rh[0])).max()),
            float(np.abs(np.asarray(ke) - np.asarray(re)).max()),
        )
        worst = max(worst, err)
        if err > atol:
            return worst, f"step {step}: head output diverged (max|diff|={err:.5f})"
    for i in range(L):
        for key in ("k", "v"):
            a = np.asarray(s_ker["layers"][i][key], np.float32)
            b = np.asarray(s_ref["layers"][i][key], np.float32)
            err = float(np.abs(a - b).max())
            worst = max(worst, err)
            if err > atol:
                return worst, f"layer {i} cache {key} diverged (max|diff|={err:.5f})"
        spk = np.asarray(s_ker["layers"][i]["slot_pos"])
        spr = np.asarray(s_ref["layers"][i]["slot_pos"])
        if not np.array_equal(spk, spr):
            return worst, f"layer {i} slot_pos diverged"
    return worst, None


def _is_compile_error(e: Exception) -> bool:
    """True for backend lowering/compile rejections (Mosaic, XLA resource
    limits, unimplemented lowerings) — the classes a bucket probe is allowed
    to report as a degraded variant rather than a harness failure."""
    if isinstance(e, NotImplementedError):
        return True
    name = type(e).__name__
    if name in ("XlaRuntimeError", "JaxRuntimeError", "MosaicError"):
        return True
    msg = str(e)
    return any(
        tag in msg
        for tag in ("Mosaic", "mosaic", "RESOURCE_EXHAUSTED", "Unsupported", "vmem")
    )


def run_segment_variant(t, qparams, packed, state0, steps, atol):
    """Compiled whole-segment kernel (ops/fused_segment.py) vs the chained
    oracle — S frames in one call, flow head included. The flow head runs
    bf16 weight chunks, so the tolerance is looser than the per-frame
    variants (see tests/test_fused_segment.py)."""
    from pocket_tts_tpu.ops.fused_backbone import pack_backbone_head, pack_backbone_int8
    from pocket_tts_tpu.ops.fused_segment import (
        fused_segment_decode,
        pack_flow_bf16,
        segment_block_mode,
    )
    from pocket_tts_tpu.ops.linear import linear
    from pocket_tts_tpu.ops.norms import layer_norm
    from pocket_tts_tpu.ops.rope import rope_angles
    from pocket_tts_tpu.ops.sampling import lsd_decode
    from pocket_tts_tpu.config.schema import FlowLMConfig
    from pocket_tts_tpu.models.flow_lm import FlowLMModel
    from pocket_tts_tpu.models.weights import quantize_int8

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
    params = flow_lm.init_params(jax.random.PRNGKey(3))
    # PRODUCTION default subtrees (input_linear included): gates the int8
    # head packing + in-kernel scale multiply on real hardware (ADVICE r3).
    q = quantize_int8({"flow_lm": params})["flow_lm"]
    packed2 = pack_backbone_int8(q["transformer"]["layers"])
    head_packed = pack_backbone_head(q)
    flow_packed = pack_flow_bf16(q["flow_net"])
    C = state0["layers"][0]["k"].shape[1]  # slot-major [1, C, H, d]
    state = flow_lm.init_state(1, C, dtype=jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(4), (1, 17, E), jnp.float32) * 0.3
    state = flow_lm.prefill(q, state, emb, jnp.full((1,), 17, jnp.int32))

    S = max(8, (steps + 7) // 8 * 8)  # segment kernel runs 8-frame groups
    noise = jax.random.normal(jax.random.PRNGKey(5), (S, 32), jnp.float32) * 0.6
    latent0 = jax.random.normal(jax.random.PRNGKey(6), (1, 32), jnp.float32)
    rng = jax.random.PRNGKey(0)

    s_ref, lat = state, latent0
    refs = []
    for i in range(S):
        is_bos = jnp.full((1,), i == 0, jnp.bool_)
        s_ref, lat, _ = flow_lm.decode_step(
            q, s_ref, lat, is_bos, rng, 0.7, 1, None, 0.0, noise=noise[i : i + 1]
        )
        refs.append(np.asarray(lat[0]))

    tstate = state["transformer"]
    pos0 = int(state["pos"][0])
    positions = (pos0 + jnp.arange(S, dtype=jnp.int32))[None, :]
    cos, sin = rope_angles(positions, E // H)
    latents, eos, new_ks, new_vs, spnew = jax.jit(
        lambda: fused_segment_decode(
            packed2, head_packed, flow_packed, latent0,
            jnp.full((1,), True, jnp.bool_), noise,
            tuple(l["k"] for l in tstate["layers"]),
            tuple(l["v"] for l in tstate["layers"]),
            tstate["layers"][0]["slot_pos"],
            jnp.full((1,), pos0, jnp.int32),
            jnp.full((1,), int(tstate["widx"]), jnp.int32),
            cos[0, :, 0], sin[0, :, 0], num_heads=H, seg_frames=S,
            # Gate exactly what production dispatches at this bucket
            # (incl. any probed per-bucket demotion).
            block=segment_block_mode(
                2 * C * E * jnp.dtype(jnp.bfloat16).itemsize, capacity=C
            ),
        )
    )()
    worst = 0.0
    for i in range(S):
        err = float(np.abs(np.asarray(latents[i]) - refs[i]).max())
        worst = max(worst, err)
        if err > atol:
            return worst, f"frame {i}: latent diverged (max|diff|={err:.5f})"
    for i in range(L):
        a = np.asarray(new_ks[i], np.float32)
        b = np.asarray(s_ref["transformer"]["layers"][i]["k"][0], np.float32)
        err = float(np.abs(a - b).max())
        worst = max(worst, err)
        if err > atol:
            return worst, f"layer {i} cache k diverged (max|diff|={err:.5f})"
    if not np.array_equal(
        np.asarray(spnew), np.asarray(s_ref["transformer"]["layers"][0]["slot_pos"])
    ):
        return worst, "slot_pos diverged"
    return worst, None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--atol", type=float, default=0.05)
    args = ap.parse_args()

    print("backend:", jax.devices()[0].platform, flush=True)
    failures = 0
    for C in (512, 1024):
        t, qparams, packed, state = build(C)
        # (vpu, quad) is the C<=512 production default; (vpu, tri) ships for
        # C>512; the rest pin the opt-in forms on real hardware.
        variants = [("vpu", "quad"), ("vpu", "tri"), ("vpu", "pair"), ("mxu", "pair")]
        for attn_mode, block in variants:
            if block == "quad" and C > 512:
                continue  # dispatcher demotes these; kernel would blow VMEM
            worst, fail = run_variant(
                t, qparams, packed, state, args.steps, attn_mode, block, args.atol
            )
            tag = "FAIL " + fail if fail else "ok"
            print(f"C={C:5d} {attn_mode:7s} {block:5s} worst={worst:.5f}  {tag}", flush=True)
            failures += bool(fail)
        # The head-folded production step (decode_step dispatch:
        # select_modes demotes head mode to pair past C=512 — tri has no
        # VMEM headroom left for the resident head blocks).
        hblock = "quad" if C <= 512 else "pair"
        worst, fail = run_head_variant(
            t, qparams, packed, state, args.steps, "vpu", hblock, args.atol
        )
        tag = "FAIL " + fail if fail else "ok"
        print(f"C={C:5d} head:vpu {hblock:5s} worst={worst:.5f}  {tag}", flush=True)
        failures += bool(fail)
        if True:
            # The whole-segment kernel (bf16 flow head -> looser tol); the
            # C=1024 bucket runs it with pair blocks (segment_block_mode).
            # A compile rejection is reported as a failed variant, not a
            # crash — the per-frame variants above are the production gate.
            try:
                worst, fail = run_segment_variant(
                    t, qparams, packed, state, args.steps, max(args.atol, 0.15)
                )
            except Exception as e:  # noqa: BLE001
                # Only lowering/compile rejections are reported as a failed
                # "compile" variant; anything else (an assertion, a harness
                # bug) must surface as itself, not hide behind a plausible
                # compile message (ADVICE r3).
                if not _is_compile_error(e):
                    raise
                worst, fail = float("nan"), f"compile: {str(e).splitlines()[0][:120]}"
            tag = "FAIL " + fail if fail else "ok"
            print(
                f"C={C:5d} segment  S={max(8, (args.steps + 7) // 8 * 8)}  "
                f"worst={worst:.5f}  {tag}",
                flush=True,
            )
            failures += bool(fail)
    print("PARITY OK" if not failures else f"PARITY FAIL ({failures} variants)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

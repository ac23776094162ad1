"""Parity tests for the whole-SEGMENT decode kernel (ops/fused_segment.py)
against S chained flow_lm.decode_step calls (the XLA oracle), at the real
model geometry (E=1024, H=16, L=6, flow dim=512 depth=6, ldim=32), in
Pallas interpret mode on CPU.

Tolerances: the kernel's flow head uses bf16 weight chunks with f32
accumulation — on TPU that is the same arithmetic XLA applies to the f32
weights under "default" matmul precision, but the CPU oracle here runs true
f32 matmuls, so the latent tolerance covers the bf16 weight rounding
compounded over the segment's recurrence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocket_tts_tpu.config.schema import FlowLMConfig
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.weights import quantize_int8
from pocket_tts_tpu.ops.fused_backbone import pack_backbone_head, pack_backbone_int8
from pocket_tts_tpu.ops.fused_segment import fused_segment_decode, pack_flow_bf16

E, H, L, C, S = 1024, 16, 6, 256, 8  # S % 8 == 0 (frame-group blocks)


@pytest.fixture(scope="module")
def setup():
    cfg = FlowLMConfig(
        dtype="float32",
        flow={"depth": 6, "dim": 512},
        transformer={
            "d_model": E,
            "hidden_scale": 4,
            "max_period": 10000,
            "num_heads": H,
            "num_layers": L,
        },
        lookup_table={
            "dim": E,
            "n_bins": 100,
            "tokenizer": "sentencepiece",
            "tokenizer_path": "unavailable://",
        },
    )
    flow_lm = FlowLMModel(config=cfg, latent_dim=32)
    params = flow_lm.init_params(jax.random.PRNGKey(0))
    q = quantize_int8({"flow_lm": params}, subtrees=("transformer",))["flow_lm"]
    packed = pack_backbone_int8(q["transformer"]["layers"])
    head_packed = pack_backbone_head(q)
    flow_packed = pack_flow_bf16(q["flow_net"])
    state = flow_lm.init_state(1, C, dtype=jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 9, E), jnp.float32) * 0.3
    state = flow_lm.prefill(q, state, emb, jnp.full((1,), 9, jnp.int32))
    return flow_lm, q, packed, head_packed, flow_packed, state


@pytest.mark.parametrize("bos", [True, False])
@pytest.mark.parametrize("block", ["pair", "tri"])
def test_segment_kernel_matches_chained_decode_steps(setup, bos, block):
    flow_lm, q, packed, head_packed, flow_packed, state0 = setup
    from pocket_tts_tpu.ops.rope import rope_angles

    rng = jax.random.PRNGKey(7)
    noise = (
        jax.random.normal(jax.random.PRNGKey(8), (S, 32), jnp.float32) * 0.6
    )
    latent0 = jax.random.normal(jax.random.PRNGKey(9), (1, 32), jnp.float32)

    # Oracle: S chained decode_steps with the same pre-drawn noise.
    s_ref = state0
    lat = latent0
    ref_latents, ref_eos = [], []
    for i in range(S):
        is_bos = jnp.full((1,), bos and i == 0, jnp.bool_)
        s_ref, lat, eos = flow_lm.decode_step(
            q, s_ref, lat, is_bos, rng, 0.7, 1, None, 0.0, noise=noise[i : i + 1]
        )
        ref_latents.append(lat)
        ref_eos.append(eos)
    ref_latents = jnp.concatenate(ref_latents)  # [S, 32]
    ref_eos = np.asarray(jnp.concatenate(ref_eos))  # [S] bool at threshold 0.0

    tstate = state0["transformer"]
    widx0 = int(tstate["widx"])
    pos0 = int(state0["pos"][0])
    positions = (pos0 + jnp.arange(S, dtype=jnp.int32))[None, :]
    cos, sin = rope_angles(positions, E // H)
    latents, eos_logits, new_ks, new_vs, spnew = fused_segment_decode(
        packed,
        head_packed,
        flow_packed,
        latent0,
        jnp.full((1,), bos, jnp.bool_),
        noise,
        tuple(l["k"] for l in tstate["layers"]),
        tuple(l["v"] for l in tstate["layers"]),
        tstate["layers"][0]["slot_pos"],
        jnp.full((1,), pos0, jnp.int32),
        jnp.full((1,), widx0, jnp.int32),
        cos[0, :, 0],
        sin[0, :, 0],
        num_heads=H,
        interpret=True,
        seg_frames=S,
        block=block,
    )
    # Tolerance: the kernel's flow matmuls take bf16 operands (exactly
    # what the TPU oracle's f32 weights get under "default" precision); the
    # CPU oracle here is true f32, and the rounding compounds through the
    # latent recurrence — measured worst-case ~0.10 over S=4 frames.
    np.testing.assert_allclose(
        np.asarray(latents), np.asarray(ref_latents), rtol=0, atol=0.15
    )
    assert np.abs(np.asarray(latents) - np.asarray(ref_latents)).mean() < 2e-2
    # EOS decisions at the oracle threshold (0.0), compared only where the
    # kernel logit sits clear of it (a logit within the numeric tolerance
    # of the threshold flips on rounding, not on a kernel bug).
    logits = np.asarray(eos_logits)
    clear = np.abs(logits) > 0.05
    np.testing.assert_array_equal((logits > 0.0)[clear], ref_eos[clear])
    # Full updated caches: history + all S appended rows + untouched tail.
    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(new_ks[i], np.float32),
            np.asarray(s_ref["transformer"]["layers"][i]["k"][0], np.float32),
            atol=0.15,
        )
        np.testing.assert_allclose(
            np.asarray(new_vs[i], np.float32),
            np.asarray(s_ref["transformer"]["layers"][i]["v"][0], np.float32),
            atol=0.15,
        )
    np.testing.assert_array_equal(
        np.asarray(spnew),
        np.asarray(s_ref["transformer"]["layers"][0]["slot_pos"]),
    )


def test_segment_dispatch_matches_scan_path(setup, monkeypatch):
    """The PRODUCTION dispatch (models/generate._segment_kernel_call,
    selected by POCKET_TTS_FUSED_SEGMENT and driven in interpret mode by
    POCKET_TTS_FUSED_INTERPRET) produces the same segment outputs — audio,
    emit, carry, state advance — as the lax.scan path."""
    flow_lm, q, packed, head_packed, flow_packed, state0 = setup
    _compare_dispatch_paths(
        flow_lm, q, packed, head_packed, flow_packed, state0, monkeypatch
    )


def test_segment_dispatch_default_int8_subtrees(setup, monkeypatch):
    """Same dispatch comparison but quantized with the PRODUCTION default
    subtrees — input_linear included — so the int8 head packing (raw int8
    codes in `win` + the in-kernel hw[4] scale multiply,
    ops/fused_backbone.pack_backbone_head) is parity-gated. Every other
    test quantizes the transformer only (ADVICE r3)."""
    flow_lm, *_ = setup
    params = flow_lm.init_params(jax.random.PRNGKey(0))
    q = quantize_int8({"flow_lm": params})["flow_lm"]  # default subtrees
    assert "q" in q["input_linear"]["weight"], "default subtrees must cover input_linear"
    packed = pack_backbone_int8(q["transformer"]["layers"])
    head_packed = pack_backbone_head(q)
    flow_packed = pack_flow_bf16(q["flow_net"])
    state0 = flow_lm.init_state(1, C, dtype=jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 9, E), jnp.float32) * 0.3
    state0 = flow_lm.prefill(q, state0, emb, jnp.full((1,), 9, jnp.int32))
    _compare_dispatch_paths(
        flow_lm, q, packed, head_packed, flow_packed, state0, monkeypatch
    )


def _compare_dispatch_paths(
    flow_lm, q, packed, head_packed, flow_packed, state0, monkeypatch
):
    import copy

    from pocket_tts_tpu.config.schema import MimiConfig
    from pocket_tts_tpu.models.generate import initial_carry, make_segment_fn
    from pocket_tts_tpu.models.mimi import MimiModel
    from tests.tiny_config import TINY

    mimi_cfg = copy.deepcopy(TINY["mimi"])
    mimi_cfg["quantizer"]["dimension"] = 32  # match the flow latent dim
    mimi = MimiModel(config=MimiConfig(**mimi_cfg))
    mimi_params = mimi.init_params(jax.random.PRNGKey(5))

    fused_q = dict(q)
    fused_q["transformer"] = dict(q["transformer"])
    fused_q["transformer"]["fused"] = packed
    fused_q["transformer"]["fused_head"] = head_packed
    fused_q["transformer"]["fused_segment"] = flow_packed

    fn = make_segment_fn(flow_lm, mimi, 1, None, S)
    rng = jax.random.PRNGKey(11)
    temp, thr = jnp.float32(0.7), jnp.float32(1e9)  # EOS off (random weights)

    outs = {}
    for name, fparams, seg_env in (
        ("scan", q, "0"),
        ("kernel", fused_q, "1"),
    ):
        monkeypatch.setenv("POCKET_TTS_FUSED_SEGMENT", seg_env)
        monkeypatch.setenv("POCKET_TTS_FUSED_INTERPRET", "1")
        params = {"flow_lm": fparams, "mimi": mimi_params}
        mimi_state = mimi.init_decode_state(1, kv_dtype=jnp.bfloat16, max_chunk_frames=S)
        carry = initial_carry(flow_lm, 1, [10**6], [10**6])
        outs[name] = fn(params, state0, mimi_state, carry, rng, temp, thr)

    (fs_a, _, c_a, audio_a, emit_a, done_a) = outs["scan"]
    (fs_b, _, c_b, audio_b, emit_b, done_b) = outs["kernel"]
    np.testing.assert_array_equal(np.asarray(emit_a), np.asarray(emit_b))
    assert bool(done_a) == bool(done_b)
    np.testing.assert_allclose(
        np.asarray(audio_b), np.asarray(audio_a), rtol=0, atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(c_b["latent"]), np.asarray(c_a["latent"]), rtol=0, atol=0.15
    )
    np.testing.assert_array_equal(np.asarray(c_a["step"]), np.asarray(c_b["step"]))
    assert int(fs_a["transformer"]["widx"]) == int(fs_b["transformer"]["widx"])
    np.testing.assert_array_equal(np.asarray(fs_a["pos"]), np.asarray(fs_b["pos"]))
    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(fs_b["transformer"]["layers"][i]["k"], np.float32),
            np.asarray(fs_a["transformer"]["layers"][i]["k"], np.float32),
            atol=0.15,
        )
        np.testing.assert_array_equal(
            np.asarray(fs_a["transformer"]["layers"][i]["slot_pos"]),
            np.asarray(fs_b["transformer"]["layers"][i]["slot_pos"]),
        )


def test_compile_probe_degrades_gracefully(setup):
    """The load-time compile probe (tts_model._probe_fused_compile) must
    DEGRADE on a backend that cannot compile Mosaic kernels — dropping the
    packed layouts with a warning so serving falls back to the XLA path —
    never raise. The CPU backend is exactly such a backend."""
    flow_lm, q, packed, head_packed, flow_packed, _state0 = setup
    from pocket_tts_tpu.models.tts_model import _probe_fused_compile

    qq = dict(q)
    qq["transformer"] = dict(q["transformer"])
    qq["transformer"]["fused"] = packed
    qq["transformer"]["fused_head"] = head_packed
    qq["transformer"]["fused_segment"] = flow_packed

    class _Shim:
        pass

    m = _Shim()
    m.params = {"flow_lm": qq}
    m.flow_lm = flow_lm
    m.state_dtype = jnp.bfloat16
    _probe_fused_compile(m)  # must not raise
    assert "fused" not in qq["transformer"]
    assert "fused_head" not in qq["transformer"]
    assert "fused_segment" not in qq["transformer"]

"""int8 FlowLM KV cache (batch-serving mode).

The batch decode is KV-cache-READ bound (BENCHMARKS.md batch roofline), so
storing K/V rows as symmetric int8 with one f32 absmax scale per row halves
the dominant HBM traffic. These tests pin:

- the quantized attention path against the f32 oracle (tolerance),
- state-structure invariants (scale leaves shaped/moved like slot_pos
  through expand/compact),
- end-to-end generation parity between a kv_int8 model and the bf16-KV
  model on the tiny geometry,
- the engine running with an int8-KV model (admission splice + park store
  carry the scale leaves through the generic row-movers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.tts_model import TTSModel
from pocket_tts_tpu.models.text import FallbackWordTokenizer
from pocket_tts_tpu.ops.attention import CausalKVAttention, quantize_kv_rows

RNG = np.random.default_rng(31)


def _attn_states(attn, B, cap):
    s32 = attn.init_state(B, cap, dtype=jnp.float32)
    s8 = attn.init_state(B, cap, dtype=jnp.int8)
    return s32, s8


def test_quantize_kv_rows_roundtrip():
    x = jnp.asarray(RNG.standard_normal((2, 5, 4, 16)).astype(np.float32)) * 3.0
    q, scale = quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and scale.shape == (2, 5)
    back = q.astype(jnp.float32) * scale[:, :, None, None]
    # Symmetric absmax int8: worst-case error is half a quantization step.
    step = scale[:, :, None, None]
    assert float(jnp.max(jnp.abs(back - x))) <= float(jnp.max(step)) * 0.5 + 1e-6


def test_row_relative_error_pinned():
    """Pin the docstring's quantization-quality claim directly: per-row
    relative RMS error on Gaussian K/V at the shipped geometry (H=16, d=64)
    is ~0.8% median and stays under 1.5% worst-row (ADVICE r4)."""
    x = jnp.asarray(RNG.standard_normal((2, 64, 16, 64)).astype(np.float32))
    q, scale = quantize_kv_rows(x)
    back = np.asarray(q.astype(jnp.float32) * scale[:, :, None, None])
    err = (back - np.asarray(x)).reshape(2 * 64, -1)
    rows = np.asarray(x).reshape(2 * 64, -1)
    rel = np.linalg.norm(err, axis=1) / np.linalg.norm(rows, axis=1)
    assert float(np.median(rel)) < 0.01
    assert float(rel.max()) < 0.015


def test_zero_rows_quantize_safely():
    q, scale = quantize_kv_rows(jnp.zeros((1, 3, 2, 8)))
    assert float(jnp.max(jnp.abs(scale))) == 1.0  # guarded scale, no NaN
    assert float(jnp.max(jnp.abs(q))) == 0.0


@pytest.mark.parametrize("read_limit", [None, 16])
def test_int8_cache_matches_f32_attention(read_limit):
    attn = CausalKVAttention(embed_dim=64, num_heads=4)
    params = attn.init_params(jax.random.PRNGKey(0))
    B, cap = 3, 32
    s32, s8 = _attn_states(attn, B, cap)
    assert sorted(s8.keys()) == ["k", "k_scale", "slot_pos", "v", "v_scale"]

    widx = jnp.int32(0)
    pos0 = jnp.broadcast_to(jnp.arange(7, dtype=jnp.int32)[None], (B, 7))
    x0 = jnp.asarray(RNG.standard_normal((B, 7, 64)).astype(np.float32))
    o32, s32 = attn(params, x0, s32, pos0, widx=widx, read_limit=read_limit)
    o8, s8 = attn(params, x0, s8, pos0, widx=widx, read_limit=read_limit)
    # Prefill output: int8 rows carry ~0.4% row-relative error.
    assert float(jnp.max(jnp.abs(o8 - o32))) < 0.05 * float(jnp.max(jnp.abs(o32))) + 1e-5

    # Decode step reading back the quantized rows.
    pos1 = jnp.full((B, 1), 7, dtype=jnp.int32)
    x1 = jnp.asarray(RNG.standard_normal((B, 1, 64)).astype(np.float32))
    o32d, _ = attn(params, x1, s32, pos1, widx=jnp.int32(7), read_limit=read_limit)
    o8d, _ = attn(params, x1, s8, pos1, widx=jnp.int32(7), read_limit=read_limit)
    assert float(jnp.max(jnp.abs(o8d - o32d))) < 0.05 * float(jnp.max(jnp.abs(o32d))) + 1e-5


def _tiny_flow():
    cfg = tiny_config()
    return FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)


def test_expand_and_compact_carry_scales():
    flow = _tiny_flow()
    params = flow.init_params(jax.random.PRNGKey(1))
    state = flow.init_state(2, 16, dtype=jnp.int8)
    emb = jnp.asarray(RNG.standard_normal((2, 5, flow.dim)).astype(np.float32)) * 0.1
    state = flow.prefill(params, state, emb, jnp.array([5, 3], jnp.int32))

    grown = flow.expand_state(state, 32)
    layer = grown["transformer"]["layers"][0]
    assert layer["k"].shape[1] == 32 and layer["k_scale"].shape == (2, 32)
    # New slots: invalid positions, zero scales.
    assert int(jnp.max(layer["slot_pos"][:, 16:])) == -1
    assert float(jnp.max(jnp.abs(layer["k_scale"][:, 16:]))) == 0.0

    compacted = flow.compact_state(grown, 8)
    c_layer = compacted["transformer"]["layers"][0]
    # Scale rows must travel with their KV rows: dequantized front rows of
    # the compacted cache equal the dequantized valid rows pre-compaction.
    def deq(l, b, i):
        return l["k"][b, i].astype(jnp.float32) * l["k_scale"][b, i]

    for b, valid in enumerate((5, 3)):
        for i in range(valid):
            np.testing.assert_allclose(
                np.asarray(deq(c_layer, b, i)), np.asarray(deq(layer, b, i)), rtol=0, atol=0
            )
        assert int(c_layer["slot_pos"][b, valid]) == -1


@pytest.fixture(scope="module")
def models():
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}

    def build(kv_int8):
        return TTSModel(
            flow_lm=flow_lm,
            mimi=mimi,
            params=params,
            tokenizer=FallbackWordTokenizer(4000),
            temp=0.7,
            lsd_decode_steps=1,
            noise_clamp=None,
            eos_threshold=1e9,
            config=cfg,
            seed=0,
            kv_int8=kv_int8,
        )

    return build(False), build(True)


def test_e2e_kv_int8_close_to_f32(models):
    m, m8 = models
    assert m8.flow_state_dtype == jnp.int8 and m.flow_state_dtype == jnp.float32
    prompt = jnp.asarray(RNG.standard_normal((1, 12, m.flow_lm.dim)).astype(np.float32))
    text = "The quick brown fox jumps over the lazy dog."
    m._rng = jax.random.PRNGKey(7)
    a = m.generate_audio(m._state_from_prompt(prompt), text, frames_after_eos=2)
    m8._rng = jax.random.PRNGKey(7)
    a8 = m8.generate_audio(m8._state_from_prompt(prompt), text, frames_after_eos=2)
    assert a.shape == a8.shape  # same noise draws -> same frame count
    corr = np.corrcoef(np.asarray(a).ravel(), np.asarray(a8).ravel())[0, 1]
    assert corr > 0.97, f"kv_int8 waveform corr {corr}"


def test_batch_generate_kv_int8(models):
    _, m8 = models
    prompt = jnp.asarray(RNG.standard_normal((1, 10, m8.flow_lm.dim)).astype(np.float32))
    voice = m8._state_from_prompt(prompt)
    out = m8.generate_audio_batch(
        [voice, voice], ["One two three.", "Four five six seven eight."],
        frames_after_eos=2,
    )
    assert len(out) == 2
    assert all(a.dtype == np.float32 and a.size > 0 for a in out)


def test_engine_tick_with_kv_int8(models):
    _, m8 = models
    from pocket_tts_tpu.serving.engine import TTSEngine

    prompt = jnp.asarray(RNG.standard_normal((1, 10, m8.flow_lm.dim)).astype(np.float32))
    voice = m8._state_from_prompt(prompt)
    eng = TTSEngine(m8, slots=2, capacity=256, segment_frames=2, text_pad=32)
    layer0 = eng.flow_state["transformer"]["layers"][0]
    assert layer0["k"].dtype == jnp.int8 and "k_scale" in layer0

    texts = ["Hello world.", "Another stream.", "Third overflows the slots."]
    handles = [eng.submit(t, voice) for t in texts]
    eng.run(stop_when_idle=True)
    for h in handles:
        audio = h.audio()
        assert h.done and audio.size > 0 and np.isfinite(audio).all()


def test_e2e_int8_weights_plus_int8_kv(models):
    """Combined mode the batch regime ships: weight-only int8 FlowLM AND
    int8 KV rows. The two quantizers compound; pin the compound waveform
    error against the f32 oracle (each alone is pinned elsewhere:
    test_int8.py / test_e2e_kv_int8_close_to_f32)."""
    from pocket_tts_tpu.models.weights import quantize_int8

    m, m8 = models
    mq = TTSModel(
        flow_lm=m.flow_lm,
        mimi=m.mimi,
        params=quantize_int8(m.params),
        tokenizer=m.tokenizer,
        temp=0.7,
        lsd_decode_steps=1,
        noise_clamp=None,
        eos_threshold=1e9,
        config=m.config,
        seed=0,
        kv_int8=True,
    )
    prompt = jnp.asarray(RNG.standard_normal((1, 12, m.flow_lm.dim)).astype(np.float32))
    text = "The quick brown fox jumps over the lazy dog."
    m._rng = jax.random.PRNGKey(7)
    a = m.generate_audio(m._state_from_prompt(prompt), text, frames_after_eos=2)
    mq._rng = jax.random.PRNGKey(7)
    aq = mq.generate_audio(mq._state_from_prompt(prompt), text, frames_after_eos=2)
    assert a.shape == aq.shape
    corr = np.corrcoef(np.asarray(a).ravel(), np.asarray(aq).ravel())[0, 1]
    assert corr > 0.95, f"int8-weights + int8-KV waveform corr {corr}"

"""Weight-only int8 quantization (models/weights.quantize_int8).

The quantized linear must equal the explicitly dequantized matmul exactly
(the per-out-channel scale commutes with the contraction), and the quantized
end-to-end decode must stay close to the float32 model — int8 is a serving
mode for the decode hot path, not a different model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.ops.linear import linear
from pocket_tts_tpu.models.weights import quantize_int8


def test_linear_int8_matches_dequantized():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (16, 8), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8), jnp.float32)

    scale = jnp.max(jnp.abs(w), axis=1) / 127.0
    q = jnp.clip(jnp.round(w / scale[:, None]), -127, 127).astype(jnp.int8)

    got = linear(x, {"q": q, "s": scale})
    want = linear(x.astype(jnp.bfloat16), (q.astype(jnp.float32) * scale[:, None]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2)

    # Quantization error itself is small for well-scaled weights.
    exact = linear(x, w)
    rel = np.linalg.norm(np.asarray(got) - np.asarray(exact)) / np.linalg.norm(np.asarray(exact))
    assert rel < 0.05, rel


def test_quantize_int8_structure():
    cfg = tiny_config()
    from pocket_tts_tpu.models.flow_lm import FlowLMModel
    from pocket_tts_tpu.models.mimi import MimiModel

    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    qparams = quantize_int8(params)

    layer0 = qparams["flow_lm"]["transformer"]["layers"][0]
    assert layer0["self_attn"]["in_proj"]["weight"]["q"].dtype == jnp.int8
    assert layer0["linear1"]["weight"]["q"].dtype == jnp.int8
    assert qparams["flow_lm"]["input_linear"]["weight"]["q"].dtype == jnp.int8
    # Islands and Mimi untouched.
    assert qparams["flow_lm"]["flow_net"] is params["flow_lm"]["flow_net"]
    assert qparams["flow_lm"]["out_eos"] is params["flow_lm"]["out_eos"]
    assert qparams["mimi"] is params["mimi"]
    # Norm weights inside the transformer stay 1-D floats.
    assert layer0["norm1"]["weight"].ndim == 1


def test_int8_segment_close_to_f32():
    """A quantized decode segment tracks the float32 segment (loose tolerance:
    this checks wiring and scale handling, not bit equality)."""
    from pocket_tts_tpu.models.flow_lm import FlowLMModel
    from pocket_tts_tpu.models.generate import initial_carry, make_segment_fn
    from pocket_tts_tpu.models.mimi import MimiModel

    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    qparams = quantize_int8(params)

    B, S, cap = 2, 4, 64
    emb = jax.random.normal(jax.random.PRNGKey(3), (B, 5, flow_lm.dim), jnp.float32) * 0.3
    lengths = jnp.full((B,), 5, jnp.int32)
    fn = make_segment_fn(flow_lm, mimi, 1, None, S)

    def run(p):
        flow_state = jax.jit(flow_lm.prefill)(
            p["flow_lm"], flow_lm.init_state(B, cap), emb, lengths
        )
        out = jax.jit(fn)(
            p,
            flow_state,
            mimi.init_decode_state(B, max_chunk_frames=S),
            initial_carry(flow_lm, B, [100] * B, [S] * B),
            jax.random.PRNGKey(2),
            jnp.float32(0.0),  # temp 0: deterministic trajectory
            jnp.float32(1e9),
        )
        return np.asarray(out[3])

    ref = run(params)
    got = run(qparams)
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.35, f"int8 audio diverged: rel={rel}"


def test_int8_model_generates_end_to_end(tmp_path):
    from pocket_tts_tpu.models.flow_lm import FlowLMModel
    from pocket_tts_tpu.models.mimi import MimiModel
    from pocket_tts_tpu.models.text import FallbackWordTokenizer
    from pocket_tts_tpu.models.tts_model import TTSModel
    from pocket_tts_tpu.models.weights import cast_serving_dtype

    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    params = quantize_int8(cast_serving_dtype(params, jnp.bfloat16))
    model = TTSModel(
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
    )
    model.state_dtype = jnp.bfloat16
    prompt = jax.random.normal(jax.random.PRNGKey(4), (1, 8, flow_lm.dim), jnp.float32) * 0.02
    voice = model._state_from_prompt(prompt)
    audio = model.generate_audio(voice, "Hello there tiny model.", frames_after_eos=2)
    assert audio.ndim == 1 and audio.shape[0] > 0 and np.isfinite(audio).all()
    with pytest.raises(ValueError, match="int8-quantized"):
        model.save_checkpoint(str(tmp_path / "nope.safetensors"))

"""bf16 serving mode: weights/KV in bfloat16 with float32 islands."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.text import FallbackWordTokenizer
from pocket_tts_tpu.models.tts_model import TTSModel
from pocket_tts_tpu.models.weights import cast_serving_dtype

RNG = np.random.default_rng(41)


def _build(state_dtype):
    cfg = tiny_config()
    flow_lm = FlowLMModel(
        config=cfg.flow_lm,
        latent_dim=cfg.mimi.quantizer.dimension,
        speaker_dim=cfg.mimi.seanet.dimension,
    )
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    model = TTSModel(
        flow_lm=flow_lm,
        mimi=mimi,
        params=params,
        tokenizer=FallbackWordTokenizer(4000),
        temp=0.0,  # deterministic: isolates dtype effects
        lsd_decode_steps=1,
        noise_clamp=None,
        eos_threshold=1e9,
        config=cfg,
        seed=0,
    )
    if state_dtype == jnp.bfloat16:
        model.params = cast_serving_dtype(model.params, jnp.bfloat16)
        model.state_dtype = jnp.bfloat16
    return model


def test_cast_keeps_fp32_islands():
    model = _build(jnp.bfloat16)
    p = model.params
    assert p["flow_lm"]["transformer"]["layers"][0]["linear1"]["weight"].dtype == jnp.bfloat16
    assert p["flow_lm"]["input_linear"]["weight"].dtype == jnp.bfloat16
    assert p["mimi"]["decoder"]["model"][0]["conv"]["weight"].dtype == jnp.bfloat16
    # islands
    assert p["flow_lm"]["out_eos"]["weight"].dtype == jnp.float32
    assert p["flow_lm"]["out_norm"]["weight"].dtype == jnp.float32
    assert p["flow_lm"]["flow_net"]["input_proj"]["weight"].dtype == jnp.float32
    assert p["flow_lm"]["emb_std"].dtype == jnp.float32
    # 1-D leaves (biases) stay fp32
    assert p["mimi"]["decoder"]["model"][0]["conv"]["bias"].dtype == jnp.float32


def test_bf16_generation_close_to_fp32():
    text = "Mixed precision serving mode check."
    f32 = _build(jnp.float32)
    bf16 = _build(jnp.bfloat16)
    prompt = jnp.array(RNG.standard_normal((1, 10, f32.flow_lm.dim)).astype(np.float32))
    v32 = f32._state_from_prompt(prompt)
    v16 = bf16._state_from_prompt(prompt)
    assert v16.tree["transformer"]["layers"][0]["k"].dtype == jnp.bfloat16

    a32 = f32.generate_audio(v32, text, frames_after_eos=2)
    a16 = bf16.generate_audio(v16, text, frames_after_eos=2)
    assert a16.dtype == np.float32
    assert a16.shape == a32.shape
    # bf16 mantissa is 8 bits; require close waveforms, not bit equality.
    denom = np.sqrt(np.mean(a32 ** 2)) + 1e-9
    rel_l2 = np.sqrt(np.mean((a16 - a32) ** 2)) / denom
    assert rel_l2 < 0.2, rel_l2

"""Conditioner protocol (conditioners/text.py), wired through TTSModel.

Reference semantics: BaseConditioner.prepare/__call__ with an output-dim
assert (pocket_tts_mlx/conditioners/base.py:20-39); LUTConditioner maps
tokens to embedding rows (pocket_tts_mlx/conditioners/text.py:32-45).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.conditioners import BaseConditioner, LUTConditioner, TokenizedText
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.text import FallbackWordTokenizer
from pocket_tts_tpu.models.tts_model import TTSModel


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
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
    )


def test_model_binds_conditioner(model):
    cond = model.conditioner
    assert isinstance(cond, LUTConditioner)
    assert cond.tokenizer is model.tokenizer
    assert cond.embed_weight is model.params["flow_lm"]["conditioner"]["embed"]["weight"]


def test_prepare_then_call_matches_embed_text(model):
    prepared = model.conditioner.prepare("hello tiny world.")
    assert isinstance(prepared, TokenizedText)
    emb = model.conditioner(prepared)
    want = model.flow_lm.embed_text(
        model.params["flow_lm"], jnp.asarray(prepared.tokens, jnp.int32)
    )
    assert emb.shape == (1, prepared.tokens.shape[1], model.flow_lm.dim)
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(want))


def test_base_conditioner_dim_assert():
    class Bad(BaseConditioner):
        def _get_condition(self, x):
            return jnp.zeros((1, 3, 7))

    with pytest.raises(AssertionError):
        Bad(dim=8, output_dim=8)("x")


def test_unbound_conditioner_raises():
    cond = LUTConditioner(
        n_bins=16, tokenizer_path="", dim=8, output_dim=8,
        tokenizer=FallbackWordTokenizer(16),
    )
    with pytest.raises(AssertionError, match="embed_weight"):
        cond(cond.prepare("hi there."))


def test_load_model_rebinds_conditioner_to_live_params(monkeypatch):
    """load_model rebuilds the params pytree (weight load, serving casts,
    quantization), so the conditioner bound at __init__ would otherwise keep
    the discarded random-init table."""
    monkeypatch.setenv("POCKET_TTS_OFFLINE", "1")
    from pocket_tts_tpu.models.tts_model import TTSModel

    m = TTSModel.load_model(param_dtype="bfloat16")
    assert (
        m.conditioner.embed_weight
        is m.params["flow_lm"]["conditioner"]["embed"]["weight"]
    )

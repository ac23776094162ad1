"""The weight-loading fallback cascade and the voice-asset shape contract.

Reference semantics: voice-cloning weights -> without-voice-cloning weights
(has_voice_cloning=False) -> error (pocket_tts_mlx/models/tts_model.py:145-151);
voice embedding files hold a [1, T, d_model] 'audio_prompt' tensor
(pocket_tts_mlx/utils/weight_conversion.py:78-89). This repo adds a final
random-init degradation step for air-gapped machines (allow_random_init).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.text import FallbackWordTokenizer
from pocket_tts_tpu.models.tts_model import PREDEFINED_VOICES, TTSModel
from pocket_tts_tpu.models.weights import save_checkpoint
from pocket_tts_tpu.utils.safetensors import save_safetensors


def _fresh_model(seed=0):
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
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


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """A loadable combined checkpoint written from a differently-seeded model."""
    donor = _fresh_model(seed=123)
    path = tmp_path_factory.mktemp("ckpt") / "weights.safetensors"
    save_checkpoint(donor.params, path)
    return path, donor.params


def _cfg_with(weights_path, without=None):
    cfg = tiny_config()
    return cfg.model_copy(
        update={
            "weights_path": weights_path,
            "weights_path_without_voice_cloning": without,
        }
    )


def test_primary_weights_load(checkpoint):
    path, donor_params = checkpoint
    model = _fresh_model(seed=0)
    model._load_weights(_cfg_with(str(path)), jnp.float32, allow_random_init=False)
    assert model.has_voice_cloning and not model.random_init
    got = model.params["flow_lm"]["input_linear"]["weight"]
    want = donor_params["flow_lm"]["input_linear"]["weight"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_fallback_to_without_voice_cloning(checkpoint, tmp_path):
    path, _ = checkpoint
    model = _fresh_model(seed=0)
    model._load_weights(
        _cfg_with(str(tmp_path / "missing.safetensors"), without=str(path)),
        jnp.float32,
        allow_random_init=False,
    )
    assert model.has_voice_cloning is False
    assert model.random_init is False

    # ... and the voice-cloning API is then rejected, mirroring the
    # reference's error path (tts_model.py:490-491 / :44-51).
    with pytest.raises(ValueError, match="voice cloning"):
        model.get_state_for_audio_prompt(str(tmp_path / "somebody.wav"))


def test_random_init_degradation(tmp_path):
    model = _fresh_model(seed=0)
    before = np.asarray(model.params["flow_lm"]["input_linear"]["weight"]).copy()
    model._load_weights(
        _cfg_with(str(tmp_path / "a.safetensors"), without=str(tmp_path / "b.safetensors")),
        jnp.float32,
        allow_random_init=True,
    )
    assert model.random_init is True and model.has_voice_cloning is False
    np.testing.assert_array_equal(
        np.asarray(model.params["flow_lm"]["input_linear"]["weight"]), before
    )


def test_both_missing_raises_without_random_init(tmp_path):
    model = _fresh_model(seed=0)
    with pytest.raises(FileNotFoundError):
        model._load_weights(
            _cfg_with(str(tmp_path / "a.safetensors"), without=str(tmp_path / "b.safetensors")),
            jnp.float32,
            allow_random_init=False,
        )


# ------------------------------------------------------------- voice contract

def _voice_file(tmp_path, array):
    path = tmp_path / "voice.safetensors"
    save_safetensors(path, {"audio_prompt": array})
    return str(path)


def test_predefined_voice_fixture_roundtrip(tmp_path, monkeypatch):
    model = _fresh_model()
    T = 9
    prompt = np.random.default_rng(0).standard_normal((1, T, model.flow_lm.dim)).astype(
        np.float32
    )
    monkeypatch.setitem(PREDEFINED_VOICES, "testvoice", _voice_file(tmp_path, prompt))
    state = model.get_state_for_audio_prompt("testvoice")
    assert state.batch_size == 1 and state.pos == [T]


def test_voice_shape_contract_rejected(tmp_path, monkeypatch):
    model = _fresh_model()
    bad_rank = np.zeros((5, model.flow_lm.dim), np.float32)
    monkeypatch.setitem(PREDEFINED_VOICES, "badvoice", _voice_file(tmp_path, bad_rank))
    with pytest.raises(ValueError, match="audio_prompt"):
        model.get_state_for_audio_prompt("badvoice")

    bad_dim = np.zeros((1, 5, model.flow_lm.dim + 1), np.float32)
    monkeypatch.setitem(PREDEFINED_VOICES, "badvoice2", _voice_file(tmp_path, bad_dim))
    with pytest.raises(ValueError, match="audio_prompt"):
        model.get_state_for_audio_prompt("badvoice2")


def test_missing_audio_prompt_key(tmp_path, monkeypatch):
    model = _fresh_model()
    path = tmp_path / "empty.safetensors"
    save_safetensors(path, {"something_else": np.zeros((1,), np.float32)})
    monkeypatch.setitem(PREDEFINED_VOICES, "keyless", str(path))
    with pytest.raises(KeyError, match="audio_prompt"):
        model.get_state_for_audio_prompt("keyless")

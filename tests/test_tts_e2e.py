"""End-to-end pipeline tests on the tiny config (random weights, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.models.tts_model import ModelState, TTSModel, stack_states
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.text import FallbackWordTokenizer

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    return TTSModel(
        flow_lm=flow_lm,
        mimi=mimi,
        params=params,
        tokenizer=FallbackWordTokenizer(4000),
        temp=0.7,
        lsd_decode_steps=1,
        noise_clamp=None,
        eos_threshold=1e9,  # random weights: disable EOS so length is deterministic
        config=cfg,
        seed=0,
    )


@pytest.fixture(scope="module")
def voice(model):
    prompt = jnp.array(RNG.standard_normal((1, 12, model.flow_lm.dim)).astype(np.float32))
    return model._state_from_prompt(prompt)


def test_generate_audio_shape_and_determinism(model, voice):
    model._rng = jax.random.PRNGKey(42)
    a1 = model.generate_audio(voice, "One two three four five six.", frames_after_eos=2)
    model._rng = jax.random.PRNGKey(42)
    a2 = model.generate_audio(voice, "One two three four five six.", frames_after_eos=2)
    assert a1.dtype == np.float32
    assert a1.shape[0] % 1920 == 0 and a1.shape[0] > 0
    np.testing.assert_array_equal(a1, a2)


def test_stream_equals_batch_collect(model, voice):
    model._rng = jax.random.PRNGKey(1)
    frames = list(
        model.generate_audio_stream(voice, "Seven eight nine ten eleven.", frames_after_eos=2)
    )
    model._rng = jax.random.PRNGKey(1)
    full = model.generate_audio(voice, "Seven eight nine ten eleven.", frames_after_eos=2)
    # bulk uses larger, unrolled scan segments: same math, different XLA
    # instruction schedule -> ~1e-9 float drift
    np.testing.assert_allclose(np.concatenate(frames), full, rtol=1e-4, atol=1e-7)
    assert all(f.shape == (1920,) for f in frames)


def test_copy_state_semantics(model, voice):
    pos_before = list(voice.pos)
    model.generate_audio(voice, "A b c d e f.", frames_after_eos=2)
    assert voice.pos == pos_before  # copy_state=True leaves the voice untouched

    work = ModelState(voice.tree, voice.pos)
    model.generate_audio(work, "A b c d e f.", frames_after_eos=2, copy_state=False)
    assert work.pos[0] > pos_before[0]  # continuation state advanced


def test_trim_and_fade(model, voice):
    model._rng = jax.random.PRNGKey(3)
    raw = model.generate_audio(voice, "Alpha beta gamma delta echo.", frames_after_eos=2)
    model._rng = jax.random.PRNGKey(3)
    trimmed = model.generate_audio(
        voice, "Alpha beta gamma delta echo.", frames_after_eos=2,
        trim_start_ms=40, fade_in_ms=15,
    )
    trim = int(24000 * 40 / 1000)
    assert trimmed.shape[0] == raw.shape[0] - trim
    fade = int(24000 * 15 / 1000)
    np.testing.assert_allclose(trimmed[0], raw[trim] * 0.0, atol=1e-6)  # ramp starts at 0
    np.testing.assert_array_equal(trimmed[fade:], raw[trim + fade:])


def test_batch_matches_single_stream(model, voice):
    """Each row of a batched generation must equal its single-stream run
    (per-stream RNG folding + per-stream positions + per-stream EOS)."""
    text = "Quick brown fox jumps over dog."
    model._rng = jax.random.PRNGKey(11)
    single = model.generate_audio(voice, text, frames_after_eos=2, warmup_frames=1)

    model._rng = jax.random.PRNGKey(11)
    batch = model.generate_audio_batch(
        stack_states(model.flow_lm, [voice, voice]), [text, text], frames_after_eos=2
    )
    assert batch[0].shape == single.shape
    # identical math modulo XLA batch-vectorization rounding
    np.testing.assert_allclose(batch[0], single, rtol=1e-4, atol=1e-6)


def test_batch_heterogeneous_lengths(model, voice):
    texts = ["Short one here.", "A much longer sentence with many more words to speak aloud."]
    outs = model.generate_audio_batch(
        stack_states(model.flow_lm, [voice, voice]), texts, frames_after_eos=2
    )
    assert len(outs) == 2
    assert outs[0].shape[0] > 0 and outs[1].shape[0] > 0
    # longer text -> longer max_gen -> more frames (EOS disabled)
    assert outs[1].shape[0] > outs[0].shape[0]


def test_lsd_decode_steps_multi_step_ode(model):
    """lsd_decode_steps > 1 (+ noise_clamp) end to end: the unrolled Euler
    loop and its jit-cache keying (reference default is 1 step;
    pocket_tts_mlx/models/flow_lm.py:18-28 supports any count)."""
    m = TTSModel(
        flow_lm=model.flow_lm,
        mimi=model.mimi,
        params=model.params,
        tokenizer=model.tokenizer,
        temp=0.7,
        lsd_decode_steps=4,
        noise_clamp=2.5,
        eos_threshold=1e9,
        config=model.config,
        seed=3,
    )
    prompt = jnp.array(RNG.standard_normal((1, 10, m.flow_lm.dim)).astype(np.float32))
    v = m._state_from_prompt(prompt)
    m._rng = jax.random.PRNGKey(21)
    a4 = m.generate_audio(v, "Twelve thirteen fourteen fifteen.", frames_after_eos=2)
    assert a4.shape[0] % 1920 == 0 and a4.shape[0] > 0
    assert np.isfinite(a4).all()
    # the step count keys the jit cache: same shapes, different programs
    m._rng = jax.random.PRNGKey(21)
    m.lsd_decode_steps = 1
    a1 = m.generate_audio(v, "Twelve thirteen fourteen fifteen.", frames_after_eos=2)
    assert a1.shape == a4.shape  # same schedule/length with EOS disabled
    assert not np.allclose(a1, a4)  # but a different ODE trajectory


def test_multi_chunk_long_text(model, voice):
    """Texts longer than max_tokens split into chunks that all synthesize."""
    text = "One two three four five six. Seven eight nine ten eleven twelve. " * 2
    model._rng = jax.random.PRNGKey(13)
    audio = model.generate_audio(voice, text, max_tokens=8, frames_after_eos=2)
    assert audio.shape[0] % 1920 == 0
    assert audio.shape[0] >= 4 * 1920


def test_batch_different_voices(model):
    """Config #4 analog: one batch, different voices with different prompt
    lengths, each row must equal its single-stream run (temp=0)."""
    old_temp = model.temp
    model.temp = 0.0
    try:
        prompts = [
            jnp.array(RNG.standard_normal((1, n, model.flow_lm.dim)).astype(np.float32))
            for n in (8, 19, 33)
        ]
        voices = [model._state_from_prompt(p) for p in prompts]
        text = "Same words spoken by three voices."

        singles = [model.generate_audio(v, text, frames_after_eos=2) for v in voices]
        batch = model.generate_audio_batch(
            stack_states(model.flow_lm, voices), [text] * 3, frames_after_eos=2
        )
        for got, want in zip(batch, singles):
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    finally:
        model.temp = old_temp


def test_continuation_context_matters(model, voice):
    """copy_state=False carries acoustic context: generating B after A must
    differ from generating B from the fresh voice state (temp=0 isolates
    conditioning effects), and must be reproducible."""
    old_temp = model.temp
    model.temp = 0.0
    try:
        text_a, text_b = "First sentence spoken here now.", "Second sentence follows on."

        def continued():
            work = ModelState(voice.tree, voice.pos, voice.written)
            model.generate_audio(work, text_a, frames_after_eos=2, copy_state=False)
            return model.generate_audio(work, text_b, frames_after_eos=2, copy_state=False)

        b_continued_1 = continued()
        b_continued_2 = continued()
        b_fresh = model.generate_audio(voice, text_b, frames_after_eos=2)

        np.testing.assert_allclose(b_continued_1, b_continued_2, rtol=1e-4, atol=1e-7)
        assert b_continued_1.shape == b_fresh.shape
        assert np.abs(b_continued_1 - b_fresh).max() > 1e-6  # context changed the audio
    finally:
        model.temp = old_temp


def test_api_surface(model, voice):
    """Reference API-surface odds and ends."""
    # device property (reference tts_model.py:79-81)
    assert model.device in ("cpu", "tpu", "gpu")
    assert model.sample_rate == 24000
    assert model.frame_size == 1920
    # size_of_dict alias (reference utils.py:15-25)
    from pocket_tts_tpu.utils.timing import size_of_dict
    assert size_of_dict(voice.tree) == voice.size_bytes() > 0
    # package exports
    import pocket_tts_tpu
    assert hasattr(pocket_tts_tpu, "TTSModel") and pocket_tts_tpu.__version__


def test_cached_voice_state(model):
    """_cached_get_state_for_audio_prompt keeps a 2-entry cache
    (reference tts_model.py:478-482)."""
    model.random_init = True  # offline: use synthetic prompts for names
    try:
        s1 = model._cached_get_state_for_audio_prompt("alba")
        s1_again = model._cached_get_state_for_audio_prompt("alba")
        assert s1 is s1_again
        model._cached_get_state_for_audio_prompt("marius")
        model._cached_get_state_for_audio_prompt("javert")  # evicts alba
        s1_new = model._cached_get_state_for_audio_prompt("alba")
        assert s1_new is not s1
    finally:
        model.random_init = False


def test_extreme_chunking_max_tokens_one(model, voice):
    """max_tokens=1 forces per-sentence chunks; everything still renders."""
    model._rng = jax.random.PRNGKey(21)
    audio = model.generate_audio(voice, "One two. Three four.", max_tokens=1,
                                 frames_after_eos=2)
    assert audio.shape[0] % 1920 == 0 and audio.shape[0] > 0


def test_minimal_voice_prompt(model):
    """A single-frame voice prompt must prefill and generate."""
    prompt = jnp.array(RNG.standard_normal((1, 1, model.flow_lm.dim)).astype(np.float32))
    state = model._state_from_prompt(prompt)
    assert state.pos == [1]
    audio = model.generate_audio(state, "Tiny prompt check here.", frames_after_eos=2)
    assert audio.shape[0] > 0


def test_capacity_growth_across_continuations(model, voice):
    """copy_state=False across several calls keeps expanding the cache."""
    work = ModelState(voice.tree, voice.pos, voice.written)
    cap0 = model.flow_lm.state_capacity(work.tree)
    for i in range(3):
        model.generate_audio(work, f"Continuation number {i} with words.",
                             frames_after_eos=2, copy_state=False)
    assert work.pos[0] > voice.pos[0]
    assert model.flow_lm.state_capacity(work.tree) >= cap0
    # positions never exceed the written mirror
    assert work.pos[0] <= work.written


def test_transfer_pcm16_matches_float_path(model, voice):
    """transfer_pcm16=True moves audio device->host as int16 (half the
    bytes); the public API still returns float32 equal to the default path
    up to one 16-bit quantization step."""
    model._rng = jax.random.PRNGKey(33)
    ref = model.generate_audio(voice, "Quantized transfer check.", frames_after_eos=2)
    try:
        model.transfer_pcm16 = True
        model._rng = jax.random.PRNGKey(33)
        q = model.generate_audio(voice, "Quantized transfer check.", frames_after_eos=2)
    finally:
        model.transfer_pcm16 = False
    assert q.dtype == np.float32
    assert q.shape == ref.shape
    np.testing.assert_allclose(q, np.clip(ref, -1.0, 1.0), atol=1.0 / 32767.0)


def test_bulk_schedule_shapes():
    """Bulk schedule: whole 64s + one power-of-2 tail covering the remainder;
    total >= max_gen, bounded overshoot, bounded set of compiled shapes."""
    from pocket_tts_tpu.models.tts_model import _bulk_schedule

    assert _bulk_schedule(0) == []
    assert _bulk_schedule(1) == [8]
    assert _bulk_schedule(64) == [64]
    assert _bulk_schedule(65) == [64, 8]
    assert _bulk_schedule(138) == [64, 64, 16]
    for n in range(1, 400):
        sched = _bulk_schedule(n)
        assert sum(sched) >= n
        assert sum(sched) - n < 64  # overshoot bounded by one big segment
        assert set(sched) <= {8, 16, 32, 64}
        assert sorted(sched, reverse=True) == sched  # big first, tail last


def test_stream_schedule_shapes():
    """Streaming schedule: 1,2,4 warmup then doubling to the 32 steady state
    with a power-of-2 tail; total >= max_gen, bounded overshoot + shape set."""
    from pocket_tts_tpu.models.tts_model import _stream_schedule

    assert _stream_schedule(0, 8) == []
    assert _stream_schedule(1, 8) == [1]
    assert _stream_schedule(7, 8) == [1, 2, 4]
    assert _stream_schedule(138, 8) == [1, 2, 4, 8, 16, 32, 32, 32, 16]
    for n in range(1, 400):
        sched = _stream_schedule(n, 8)
        assert sum(sched) >= n
        assert sum(sched) - n < 32  # overshoot bounded by the tail bucket
        assert set(sched) <= {1, 2, 4, 8, 16, 32}
        assert sched[0] == 1  # TTFA: first dispatch is a single frame


def test_batch_read_limit_invariance(model, voice, monkeypatch):
    """The KV read-limit bucketing (on by default for B>1) must not change
    outputs: limited reads only skip rows that hold no valid slots."""
    import jax

    from pocket_tts_tpu.models.tts_model import stack_states

    texts = ["Read limit check one.", "And a second stream here."]
    stacked = stack_states(model.flow_lm, [voice, voice])

    model._rng = jax.random.PRNGKey(23)
    on = model.generate_audio_batch(stacked, texts, frames_after_eos=2)

    monkeypatch.setenv("POCKET_TTS_READ_LIMIT", "0")
    model._rng = jax.random.PRNGKey(23)
    off = model.generate_audio_batch(stacked, texts, frames_after_eos=2)

    for a, b in zip(on, off):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

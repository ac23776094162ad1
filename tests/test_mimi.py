"""Mimi codec tests: shapes, streaming chunk-invariance of the decode path."""

import numpy as np
import jax
import jax.numpy as jnp

from tiny_config import tiny_config
from pocket_tts_tpu.models.mimi import MimiModel

RNG = np.random.default_rng(3)


def _np(x):
    return np.asarray(x)


def _model():
    mimi = MimiModel(config=tiny_config().mimi)
    params = mimi.init_params(jax.random.PRNGKey(0))
    return mimi, params


def test_frame_math():
    mimi, _ = _model()
    assert mimi.frame_size == 1920
    assert mimi.encoder.hop_length == 120
    assert mimi.encoder_frame_rate == 200.0
    assert mimi.downsample_stride == 16


def test_encode_shapes():
    mimi, params = _model()
    x = RNG.standard_normal((1, 1, 24000)).astype(np.float32)  # 1 s
    latent = mimi.encode_to_latent(params, jnp.array(x))
    # 1 s at 12.5 Hz, +1 frame from the replicate-padded downsampler
    assert latent.shape[0] == 1 and latent.shape[1] == 48
    assert 12 <= latent.shape[2] <= 14


def test_streaming_decode_equals_full_decode():
    """Frame-by-frame decode == decoding the whole latent sequence at once.

    This is the chunk-invariance contract the reference's streaming design is
    built around (reference: pocket_tts_mlx/modules/conv.py:74-200), checked
    through the entire decoder stack: upsampler + transformer + SEANet.
    """
    mimi, params = _model()
    B, n_frames = 2, 5
    latents = RNG.standard_normal((B, 8, n_frames)).astype(np.float32) * 0.5

    quantized = mimi.quantize(params, jnp.array(latents))  # [B, 48, n_frames]

    # Full decode: run all frames through a fresh streaming state in one call.
    state = mimi.init_decode_state(B)
    full, _ = mimi.decode_from_latent(params, quantized, state)
    assert full.shape == (B, 1, n_frames * 1920)

    # Frame-by-frame decode with carried state.
    state = mimi.init_decode_state(B)
    outs = []
    for i in range(n_frames):
        frame, state = mimi.decode_from_latent(params, quantized[:, :, i : i + 1], state)
        outs.append(_np(frame))
    streamed = np.concatenate(outs, axis=-1)

    np.testing.assert_allclose(streamed, _np(full), rtol=1e-4, atol=1e-5)


def test_streaming_decode_ring_wraparound():
    """Decode enough frames that the codec transformer's ring wraps
    (context=32, capacity=ctx rounded to 128-aligned; 20 frames = 320 steps)."""
    mimi, params = _model()
    B, n_frames = 1, 20
    latents = RNG.standard_normal((B, 8, n_frames)).astype(np.float32) * 0.5
    quantized = mimi.quantize(params, jnp.array(latents))

    state = mimi.init_decode_state(B)
    frame_jit = jax.jit(
        lambda p, q, s: mimi.decode_from_latent(p, q, s)
    )
    outs = []
    for i in range(n_frames):
        frame, state = frame_jit(params, quantized[:, :, i : i + 1], state)
        outs.append(_np(frame))
    audio = np.concatenate(outs, axis=-1)
    assert audio.shape == (B, 1, n_frames * 1920)
    assert np.isfinite(audio).all()

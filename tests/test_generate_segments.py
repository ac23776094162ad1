"""Segment-grouping invariance of the fused generate step.

The segment function scans FlowLM autoregressively and then vocodes the whole
segment in one bulk Mimi chunk (models/generate.py). Outputs must not depend
on how frames are grouped into segments: per-frame RNG is folded by the
absolute tick, and the Mimi vocoder is chunk-invariant by construction
(streaming conv / ring-attention carries). The reference decodes strictly one
frame at a time (pocket_tts_mlx/models/tts_model.py:402-428), so matching any
grouping to the S=1 grouping is exactly matching the reference loop order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tiny_config import tiny_config
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.generate import (
    decode_mimi_chunk,
    decode_mimi_frame,
    initial_carry,
    make_segment_fn,
)
from pocket_tts_tpu.models.mimi import MimiModel


def _setup(B=2, cap=64):
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    emb = jax.random.normal(jax.random.PRNGKey(3), (B, 5, flow_lm.dim), jnp.float32)
    lengths = jnp.full((B,), 5, jnp.int32)
    flow_state = jax.jit(flow_lm.prefill)(
        params["flow_lm"], flow_lm.init_state(B, cap), emb, lengths
    )
    return flow_lm, mimi, params, flow_state


def test_segment_grouping_invariance():
    B, S = 2, 6
    flow_lm, mimi, params, flow_state0 = _setup(B=B)
    rng = jax.random.PRNGKey(11)
    temp = jnp.float32(0.7)
    eos_thr = jnp.float32(1e9)

    def run(seg_sizes):
        flow_state = flow_state0
        mimi_state = mimi.init_decode_state(B, max_chunk_frames=max(seg_sizes))
        carry = initial_carry(flow_lm, B, [100] * B, [S] * B)
        audio_parts = []
        for s in seg_sizes:
            fn = make_segment_fn(flow_lm, mimi, 1, None, s)
            flow_state, mimi_state, carry, audio, emit, _ = jax.jit(fn)(
                params, flow_state, mimi_state, carry, rng, temp, eos_thr
            )
            audio_parts.append(np.asarray(audio))
        return np.concatenate(audio_parts, axis=1), jax.device_get(carry)

    bulk_audio, bulk_carry = run([S])
    framewise_audio, frame_carry = run([1] * S)
    np.testing.assert_allclose(bulk_audio, framewise_audio, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(bulk_carry["step"]), np.asarray(frame_carry["step"])
    )

    mixed_audio, _ = run([2, 1, 3])
    np.testing.assert_allclose(bulk_audio, mixed_audio, rtol=1e-4, atol=1e-5)


def test_decode_mimi_chunk_matches_frames():
    """Bulk vocode of S latents == S single-frame vocodes (chunk invariance
    through the denorm + quantizer + codec chain)."""
    B, S = 2, 5
    flow_lm, mimi, params, _ = _setup(B=B)
    latents = jax.random.normal(jax.random.PRNGKey(9), (B, S, flow_lm.ldim), jnp.float32)

    state_bulk = mimi.init_decode_state(B, max_chunk_frames=S)
    audio_bulk, _ = jax.jit(
        lambda p, l, s: decode_mimi_chunk(p["flow_lm"], p["mimi"], mimi, l, s)
    )(params, latents, state_bulk)

    state_fw = mimi.init_decode_state(B, max_chunk_frames=S)
    frames = []
    frame_fn = jax.jit(
        lambda p, l, s: decode_mimi_frame(p["flow_lm"], p["mimi"], mimi, l, s)
    )
    for i in range(S):
        frame, state_fw = frame_fn(params, latents[:, i], state_fw)
        frames.append(np.asarray(frame))
    audio_fw = np.stack(frames, axis=1)
    np.testing.assert_allclose(np.asarray(audio_bulk), audio_fw, rtol=1e-4, atol=1e-5)

"""Attention tests: streaming-vs-full equivalence and torch-mirror parity."""

import numpy as np
import jax
import jax.numpy as jnp

import torch_mirror as tm
from pocket_tts_tpu.ops.attention import CausalKVAttention, WindowedRingAttention

RNG = np.random.default_rng(11)


def _np(x):
    return np.asarray(x)


def test_causal_prefill_matches_torch_full_attention():
    attn = CausalKVAttention(embed_dim=64, num_heads=4)
    params = attn.init_params(jax.random.PRNGKey(0))
    B, T = 2, 12
    x = RNG.standard_normal((B, T, 64)).astype(np.float32)

    state = attn.init_state(B, capacity=32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
    out, _ = attn(params, jnp.array(x), state, positions, jnp.int32(0))

    ref = tm.causal_attention(
        x, _np(params["in_proj"]["weight"]).reshape(-1, params["in_proj"]["weight"].shape[-1]), _np(params["out_proj"]["weight"]), num_heads=4
    )
    np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-5)


def test_causal_streaming_stepwise_equals_full():
    """Prefill 5 tokens then decode 1-by-1 == one full pass (KV-cache correctness)."""
    attn = CausalKVAttention(embed_dim=32, num_heads=2)
    params = attn.init_params(jax.random.PRNGKey(1))
    B, T = 1, 9
    x = RNG.standard_normal((B, T, 32)).astype(np.float32)

    def positions(start, n):
        return jnp.broadcast_to(jnp.arange(start, start + n, dtype=jnp.int32)[None, :], (B, n))

    state = attn.init_state(B, capacity=16)
    full, _ = attn(params, jnp.array(x), state, positions(0, T), jnp.int32(0))

    state = attn.init_state(B, capacity=16)
    out5, state = attn(params, jnp.array(x[:, :5]), state, positions(0, 5), jnp.int32(0))
    outs = [_np(out5)]
    for t in range(5, T):
        y, state = attn(params, jnp.array(x[:, t : t + 1]), state, positions(t, 1), jnp.int32(t))
        outs.append(_np(y))
    streamed = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, _np(full), rtol=1e-4, atol=1e-5)


def test_causal_per_stream_positions():
    """Streams at different positions in one batch must match separate runs."""
    attn = CausalKVAttention(embed_dim=32, num_heads=2)
    params = attn.init_params(jax.random.PRNGKey(2))
    cap = 16
    x0 = RNG.standard_normal((1, 3, 32)).astype(np.float32)
    x1 = RNG.standard_normal((1, 3, 32)).astype(np.float32)
    pre0 = RNG.standard_normal((1, 4, 32)).astype(np.float32)
    pre1 = RNG.standard_normal((1, 7, 32)).astype(np.float32)

    def run_single(pre, x):
        state = attn.init_state(1, cap)
        n = pre.shape[1]
        _, state = attn(
            params, jnp.array(pre), state, jnp.arange(n, dtype=jnp.int32)[None, :],
            jnp.int32(0),
        )
        out, _ = attn(
            params, jnp.array(x), state,
            (n + jnp.arange(x.shape[1], dtype=jnp.int32))[None, :],
            jnp.int32(n),
        )
        return _np(out)

    ref0, ref1 = run_single(pre0, x0), run_single(pre1, x1)

    # Batched: right-pad the shorter prefill; padded entries get position -1
    # and land in slots that are never valid.
    state = attn.init_state(2, cap)
    pre = np.zeros((2, 7, 32), dtype=np.float32)
    pre[0, :4] = pre0[0]
    pre[1] = pre1[0]
    prefill_pos = np.stack(
        [np.array([0, 1, 2, 3, -1, -1, -1]), np.arange(7)]
    ).astype(np.int32)
    _, state = attn(params, jnp.array(pre), state, jnp.array(prefill_pos), jnp.int32(0))
    q_pos = np.stack([4 + np.arange(3), 7 + np.arange(3)]).astype(np.int32)
    out, _ = attn(
        params,
        jnp.array(np.concatenate([x0, x1], axis=0)),
        state,
        jnp.array(q_pos),
        jnp.int32(7),
    )
    np.testing.assert_allclose(_np(out)[0:1], ref0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(out)[1:2], ref1, rtol=1e-4, atol=1e-5)


def test_windowed_full_matches_torch():
    attn = WindowedRingAttention(embed_dim=32, num_heads=4, context=6)
    params = attn.init_params(jax.random.PRNGKey(3))
    B, T = 2, 20
    x = RNG.standard_normal((B, T, 32)).astype(np.float32)
    out = attn.forward(params, jnp.array(x))
    ref = tm.windowed_attention(
        x, _np(params["in_proj"]["weight"]).reshape(-1, params["in_proj"]["weight"].shape[-1]), _np(params["out_proj"]["weight"]),
        num_heads=4, context=6,
    )
    np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-5)


def test_windowed_ring_streaming_equals_full_with_wraparound():
    """Chunked ring-buffer attention == full windowed attention, including
    after the ring wraps (T >> capacity)."""
    attn = WindowedRingAttention(embed_dim=16, num_heads=2, context=8)
    params = attn.init_params(jax.random.PRNGKey(4))
    B, T, chunk = 1, 64, 4
    cap = 16  # small ring: wraps 4 times
    x = RNG.standard_normal((B, T, 16)).astype(np.float32)

    full = _np(attn.forward(params, jnp.array(x)))

    state = attn.init_state(B, capacity=cap)
    outs = []
    for i in range(0, T, chunk):
        pos = i + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        y, state = attn(
            params, jnp.array(x[:, i : i + chunk]), state, jnp.broadcast_to(pos, (B, chunk))
        )
        outs.append(_np(y))
    streamed = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-5)


def test_causal_forward_matches_streaming_call():
    """The cache-free training forward must equal the streaming KV path."""
    attn = CausalKVAttention(embed_dim=32, num_heads=4)
    params = attn.init_params(jax.random.PRNGKey(7))
    B, T = 2, 10
    x = RNG.standard_normal((B, T, 32)).astype(np.float32)

    full = attn.forward(params, jnp.array(x))
    state = attn.init_state(B, capacity=16)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
    streamed, _ = attn(params, jnp.array(x), state, positions, jnp.int32(0))
    np.testing.assert_allclose(_np(full), _np(streamed), rtol=1e-5, atol=1e-6)


def test_causal_read_limit_matches_full_read():
    """A read_limit covering every valid row (R >= widx + T) must be exactly
    the full-capacity read: rows past the limit hold no valid slots, so
    masking them (full read) and not reading them (limited) are the same
    attention. The batch decode path dispatches with host-bucketed limits
    (models/tts_model._generate_batch_frames)."""
    attn = CausalKVAttention(embed_dim=32, num_heads=2)
    params = attn.init_params(jax.random.PRNGKey(2))
    B, T, CAP = 3, 6, 64
    x = RNG.standard_normal((B, T, 32)).astype(np.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))

    state = attn.init_state(B, capacity=CAP)
    full, full_state = attn(params, jnp.array(x), state, positions, jnp.int32(0))

    state = attn.init_state(B, capacity=CAP)
    limited, lim_state = attn(
        params, jnp.array(x), state, positions, jnp.int32(0), read_limit=8
    )
    np.testing.assert_allclose(_np(limited), _np(full), rtol=1e-5, atol=1e-6)
    # The append side is untouched: states identical at full capacity.
    for key in ("k", "v", "slot_pos"):
        np.testing.assert_array_equal(_np(lim_state[key]), _np(full_state[key]))


def test_windowed_banded_matches_dense_bitwise(monkeypatch):
    """The query-blocked (banded) ring attention must be BITWISE equal to
    the dense [T, cap] form: every masked score underflows to exactly 0.0
    in the f32 softmax, and the band always covers the live window. This
    is the batch-vocoder decode shape class (T a multiple of 128,
    context-wide band << capacity)."""
    attn = WindowedRingAttention(embed_dim=64, num_heads=2, context=250)
    params = attn.init_params(jax.random.PRNGKey(11))
    B, T, cap = 2, 256, 640
    x = RNG.standard_normal((B, T, 64)).astype(np.float32)

    def run(start_pos):
        state = attn.init_state(B, capacity=cap)
        # Pre-roll one chunk so the ring holds history, then measure chunk 2.
        pos0 = start_pos + jnp.arange(T, dtype=jnp.int32)[None, :]
        _, state = attn(params, jnp.array(x), state, jnp.broadcast_to(pos0, (B, T)))
        pos1 = pos0 + T
        y, _ = attn(params, jnp.array(x)[:, ::-1], state, jnp.broadcast_to(pos1, (B, T)))
        return _np(y)

    banded = run(0)
    monkeypatch.setattr(WindowedRingAttention, "_QBLOCK", 1 << 30)  # forces dense
    dense = run(0)
    np.testing.assert_array_equal(banded, dense)

"""Streaming convolution tests: chunk invariance + torch parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torch_mirror as tm
from pocket_tts_tpu.ops.conv import (
    StreamingConv1d,
    StreamingConvTranspose1d,
    convtr_weight_from_torch,
)

RNG = np.random.default_rng(7)


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize(
    "cin,cout,k,stride,dilation,pad_mode",
    [
        (4, 8, 7, 1, 1, "constant"),
        (4, 8, 3, 1, 2, "constant"),
        (6, 6, 8, 4, 1, "constant"),
        (6, 6, 8, 4, 1, "replicate"),
        (5, 5, 12, 6, 1, "constant"),
    ],
)
def test_streaming_conv_chunked_equals_full(cin, cout, k, stride, dilation, pad_mode):
    conv = StreamingConv1d(cin, cout, k, stride=stride, dilation=dilation, pad_mode=pad_mode)
    params = conv.init_params(jax.random.PRNGKey(0))
    B, T = 2, stride * 24
    x = RNG.standard_normal((B, cin, T)).astype(np.float32)

    full = _np(conv.forward(params, jnp.array(x)))

    state = conv.init_state(B)
    outs = []
    chunk = stride * 4
    for i in range(0, T, chunk):
        y, state = conv(params, jnp.array(x[:, :, i : i + chunk]), state)
        outs.append(_np(y))
    streamed = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(streamed, full, rtol=1e-5, atol=1e-5)

    # torch parity of the full-sequence (causal-pad) semantics
    ref = tm.causal_conv1d(
        x, _np(params["weight"]), _np(params.get("bias")), stride, dilation, 1, pad_mode
    )
    np.testing.assert_allclose(full, ref, rtol=1e-4, atol=1e-5)


def test_streaming_conv_replicate_first_chunk_uses_first_sample():
    """Replicate mode must left-pad the very first chunk with x[..., :1]."""
    conv = StreamingConv1d(2, 3, 8, stride=4, pad_mode="replicate")
    params = conv.init_params(jax.random.PRNGKey(1))
    x = RNG.standard_normal((1, 2, 16)).astype(np.float32) + 5.0  # offset so zeros differ

    state = conv.init_state(1)
    y, _ = conv(params, jnp.array(x), state)
    ref = tm.causal_conv1d(x, _np(params["weight"]), _np(params["bias"]), 4, 1, 1, "replicate")
    np.testing.assert_allclose(_np(y), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,groups,bias",
    [
        (8, 4, 12, 6, 1, True),
        (8, 4, 10, 5, 1, True),
        (8, 4, 8, 4, 1, False),
        (6, 6, 32, 16, 6, False),  # depthwise (the Mimi upsampler shape)
    ],
)
def test_streaming_convtr_chunked_equals_full_and_torch(cin, cout, k, stride, groups, bias):
    convtr = StreamingConvTranspose1d(cin, cout, k, stride=stride, groups=groups, bias=bias)
    params = convtr.init_params(jax.random.PRNGKey(2))
    if bias:
        params["bias"] = jnp.array(RNG.standard_normal(cout).astype(np.float32))
    B, T = 2, 12
    x = RNG.standard_normal((B, cin, T)).astype(np.float32)

    full = _np(convtr.forward(params, jnp.array(x)))
    assert full.shape == (B, cout, T * stride)

    state = convtr.init_state(B)
    outs = []
    for i in range(0, T, 3):
        y, state = convtr(params, jnp.array(x[:, :, i : i + 3]), state)
        outs.append(_np(y))
    streamed = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-5)

    # torch parity: rebuild the torch-layout weight and compare
    w_ours = _np(params["weight"])  # (out, in/g, k) flipped
    w_unflipped = w_ours[:, :, ::-1]
    w_torch = np.transpose(
        w_unflipped.reshape(groups, cout // groups, cin // groups, k), (0, 2, 1, 3)
    ).reshape(cin, cout // groups, k)
    bias_np = _np(params["bias"]) if "bias" in params else None
    ref = tm.streaming_conv_transpose1d_full(
        x, np.ascontiguousarray(w_torch), bias_np, stride, groups
    )
    np.testing.assert_allclose(full, ref, rtol=1e-4, atol=1e-5)


def test_convtr_weight_roundtrip():
    """convtr_weight_from_torch must be the exact inverse of the test rebuild."""
    cin, cout, k, groups = 8, 4, 6, 2
    w_torch = RNG.standard_normal((cin, cout // groups, k)).astype(np.float32)
    w_ours = convtr_weight_from_torch(w_torch, groups=groups)
    assert w_ours.shape == (cout, cin // groups, k)
    w_back = np.transpose(
        w_ours[:, :, ::-1].reshape(groups, cout // groups, cin // groups, k), (0, 2, 1, 3)
    ).reshape(cin, cout // groups, k)
    np.testing.assert_array_equal(w_back, w_torch)

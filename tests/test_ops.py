"""Unit parity tests for the numeric primitives against the torch mirror."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torch_mirror as tm
from pocket_tts_tpu.ops.norms import layer_norm, rms_norm_ddof1
from pocket_tts_tpu.ops.rope import apply_rope
from pocket_tts_tpu.ops.adaln import SimpleMLPAdaLN
from pocket_tts_tpu.ops.sampling import lsd_decode

RNG = np.random.default_rng(42)


def _np(x):
    return np.asarray(x)


def test_rms_norm_ddof1_matches_torch():
    x = RNG.standard_normal((3, 7, 64)).astype(np.float32)
    alpha = RNG.standard_normal(64).astype(np.float32)
    ours = _np(rms_norm_ddof1(jnp.array(x), jnp.array(alpha), eps=1e-5))
    ref = tm.rms_norm_ddof1(x, alpha, eps=1e-5)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_layer_norm_eps_variants_match_torch():
    x = RNG.standard_normal((2, 5, 32)).astype(np.float32)
    w = RNG.standard_normal(32).astype(np.float32)
    b = RNG.standard_normal(32).astype(np.float32)
    for eps in (1e-5, 1e-6):
        ours = _np(layer_norm(jnp.array(x), jnp.array(w), jnp.array(b), eps=eps))
        ref = tm.layer_norm(x, w, b, eps=eps)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    # affine-free variant (FinalLayer)
    ours = _np(layer_norm(jnp.array(x), eps=1e-6))
    ref = tm.layer_norm(x, eps=1e-6)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("offset", [0, 17])
def test_rope_matches_torch(offset):
    B, T, H, D = 2, 9, 4, 32
    q = RNG.standard_normal((B, T, H, D)).astype(np.float32)
    k = RNG.standard_normal((B, T, H, D)).astype(np.float32)
    positions = jnp.arange(T, dtype=jnp.int32)[None, :] + offset
    positions = jnp.broadcast_to(positions, (B, T))
    qj, kj = apply_rope(jnp.array(q), jnp.array(k), positions)
    qt, kt = tm.apply_rope(q, k, np.full((B,), offset))
    np.testing.assert_allclose(_np(qj), qt, rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(_np(kj), kt, rtol=1e-4, atol=5e-5)


def test_rope_per_stream_offsets():
    """Per-stream positions must equal applying scalar offsets stream-by-stream."""
    B, T, H, D = 3, 4, 2, 16
    q = RNG.standard_normal((B, T, H, D)).astype(np.float32)
    k = RNG.standard_normal((B, T, H, D)).astype(np.float32)
    offsets = np.array([0, 5, 1000], dtype=np.int32)
    positions = jnp.array(offsets)[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    qj, kj = apply_rope(jnp.array(q), jnp.array(k), positions)
    for b in range(B):
        qb, kb = apply_rope(
            jnp.array(q[b : b + 1]),
            jnp.array(k[b : b + 1]),
            jnp.arange(T, dtype=jnp.int32)[None, :] + int(offsets[b]),
        )
        np.testing.assert_allclose(_np(qj)[b], _np(qb)[0], rtol=1e-6, atol=1e-6)


def test_adaln_mlp_matches_torch_mirror():
    mlp = SimpleMLPAdaLN(
        in_channels=8, model_channels=32, out_channels=8, cond_channels=24,
        num_res_blocks=3, num_time_conds=2,
    )
    params = mlp.init_params(jax.random.PRNGKey(0))
    params_np = jax.tree_util.tree_map(np.asarray, params)

    B = 4
    c = RNG.standard_normal((B, 24)).astype(np.float32)
    s = np.zeros((B, 1), dtype=np.float32)
    t = np.ones((B, 1), dtype=np.float32)
    x = RNG.standard_normal((B, 8)).astype(np.float32)

    ours = _np(mlp(params, jnp.array(c), jnp.array(s), jnp.array(t), jnp.array(x)))
    ref = tm.adaln_mlp(params_np, c, s, t, x)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_lsd_decode_euler_steps():
    """lsd_decode must evaluate v at (i/n, (i+1)/n) and step by v/n."""
    calls = []

    def v(s, t, x):
        calls.append((float(s[0, 0]), float(t[0, 0])))
        return x * 0.0 + 1.0

    x0 = jnp.zeros((2, 3))
    out = lsd_decode(v, x0, num_steps=4)
    np.testing.assert_allclose(_np(out), np.ones((2, 3)), rtol=1e-6)
    assert calls == [(0.0, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0)]

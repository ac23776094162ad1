"""FlowLM tests: prefill/decode consistency, EOS, expansion, determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from tiny_config import tiny_config
from pocket_tts_tpu.models.flow_lm import FlowLMModel

RNG = np.random.default_rng(5)


def _np(x):
    return np.asarray(x)


def _model():
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    params = flow_lm.init_params(jax.random.PRNGKey(0))
    return flow_lm, params


def test_decode_step_shapes_and_determinism():
    flow_lm, params = _model()
    B = 2
    state = flow_lm.init_state(B, capacity=64)
    emb = jnp.array(RNG.standard_normal((B, 10, flow_lm.dim)).astype(np.float32))
    state = flow_lm.prefill(params, state, emb, jnp.full((B,), 10, jnp.int32))
    assert _np(state["pos"]).tolist() == [10, 10]

    rng = jax.random.PRNGKey(7)
    latent = jnp.zeros((B, flow_lm.ldim))
    is_bos = jnp.ones((B,), bool)
    s1, l1, e1 = flow_lm.decode_step(
        params, state, latent, is_bos, rng, 0.7, 1, None, -4.0
    )
    s2, l2, e2 = flow_lm.decode_step(
        params, state, latent, is_bos, rng, 0.7, 1, None, -4.0
    )
    assert l1.shape == (B, flow_lm.ldim)
    assert e1.shape == (B,)
    np.testing.assert_array_equal(_np(l1), _np(l2))  # same rng -> same sample
    assert _np(s1["pos"]).tolist() == [11, 11]
    del s2, e2


def test_expand_state_preserves_content():
    flow_lm, params = _model()
    state = flow_lm.init_state(1, capacity=64)
    emb = jnp.array(RNG.standard_normal((1, 5, flow_lm.dim)).astype(np.float32))
    state = flow_lm.prefill(params, state, emb, jnp.full((1,), 5, jnp.int32))

    rng = jax.random.PRNGKey(0)
    latent = jnp.zeros((1, flow_lm.ldim))
    bos = jnp.ones((1,), bool)
    _, l_small, _ = flow_lm.decode_step(params, state, latent, bos, rng, 0.7, 1, None, -4.0)

    grown = flow_lm.expand_state(state, 128)
    assert flow_lm.state_capacity(grown) == 128
    _, l_big, _ = flow_lm.decode_step(params, grown, latent, bos, rng, 0.7, 1, None, -4.0)
    np.testing.assert_allclose(_np(l_small), _np(l_big), rtol=1e-4, atol=1e-5)


def test_noise_temperature_and_clamp():
    flow_lm, params = _model()
    state = flow_lm.init_state(1, capacity=32)
    emb = jnp.array(RNG.standard_normal((1, 3, flow_lm.dim)).astype(np.float32))
    state = flow_lm.prefill(params, state, emb, jnp.full((1,), 3, jnp.int32))
    latent = jnp.zeros((1, flow_lm.ldim))
    bos = jnp.ones((1,), bool)
    rng = jax.random.PRNGKey(1)
    # temp=0 -> noise is exactly zero -> output fully deterministic given cond
    _, l_zero_a, _ = flow_lm.decode_step(params, state, latent, bos, rng, 0.0, 1, None, -4.0)
    _, l_zero_b, _ = flow_lm.decode_step(
        params, state, latent, bos, jax.random.PRNGKey(99), 0.0, 1, None, -4.0
    )
    np.testing.assert_allclose(_np(l_zero_a), _np(l_zero_b), rtol=1e-5, atol=1e-6)


def test_batch_row_independence():
    """Row b of a batched decode must equal the same stream run alone."""
    flow_lm, params = _model()
    cap = 64
    emb0 = RNG.standard_normal((1, 4, flow_lm.dim)).astype(np.float32)
    emb1 = RNG.standard_normal((1, 6, flow_lm.dim)).astype(np.float32)

    def run_single(emb):
        state = flow_lm.init_state(1, cap)
        state = flow_lm.prefill(
            params, state, jnp.array(emb), jnp.full((1,), emb.shape[1], jnp.int32)
        )
        rng = jax.random.PRNGKey(5)
        _, latent, _ = flow_lm.decode_step(
            params, state, jnp.zeros((1, flow_lm.ldim)), jnp.ones((1,), bool),
            rng, 0.0, 1, None, -4.0,
        )
        return _np(latent)

    ref0, ref1 = run_single(emb0), run_single(emb1)

    state = flow_lm.init_state(2, cap)
    emb = np.zeros((2, 6, flow_lm.dim), dtype=np.float32)
    emb[0, :4] = emb0[0]
    emb[1] = emb1[0]
    state = flow_lm.prefill(params, state, jnp.array(emb), jnp.array([4, 6], jnp.int32))
    rng = jax.random.PRNGKey(5)
    _, latent, _ = flow_lm.decode_step(
        params, state, jnp.zeros((2, flow_lm.ldim)), jnp.ones((2,), bool),
        rng, 0.0, 1, None, -4.0,
    )
    np.testing.assert_allclose(_np(latent)[0], ref0[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(latent)[1], ref1[0], rtol=1e-4, atol=1e-5)

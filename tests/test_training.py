"""Flow-matching training: loss sanity, gradient flow, optimizer step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.training.flow_matching import (
    flow_matching_loss,
    init_train_state,
    make_train_step,
)

RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    params = flow_lm.init_params(jax.random.PRNGKey(0))
    return flow_lm, params


def _batch(flow_lm, B=2, Tt=6, Tl=5):
    tokens = jnp.array(RNG.integers(0, 4000, (B, Tt)), dtype=jnp.int32)
    latents = jnp.array(RNG.standard_normal((B, Tl, flow_lm.ldim)).astype(np.float32))
    eos = jnp.zeros((B, Tl), jnp.float32).at[:, -1].set(1.0)
    return tokens, latents, eos


def test_loss_finite_and_composed(setup):
    flow_lm, params = setup
    tokens, latents, eos = _batch(flow_lm)
    loss, metrics = flow_matching_loss(
        flow_lm, params, jax.random.PRNGKey(1), tokens, latents, eos
    )
    assert np.isfinite(float(loss))
    assert float(metrics["loss"]) == pytest.approx(
        float(metrics["mse"]) + float(metrics["eos_bce"]), rel=1e-5
    )


def test_train_step_descends(setup):
    flow_lm, params = setup
    optimizer = optax.adamw(1e-3)
    state = init_train_state(flow_lm, params, optimizer)
    step = jax.jit(make_train_step(flow_lm, optimizer))

    tokens, latents, eos = _batch(flow_lm, B=4)
    losses = []
    for i in range(12):
        state, metrics = step(state, jax.random.fold_in(jax.random.PRNGKey(2), i), tokens, latents, eos)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 12
    # Overfitting a fixed tiny batch must reduce the loss substantially.
    assert losses[-1] < losses[0] * 0.9, losses


def test_gradients_reach_all_components(setup):
    flow_lm, params = setup
    tokens, latents, eos = _batch(flow_lm)

    def loss_fn(p):
        return flow_matching_loss(flow_lm, p, jax.random.PRNGKey(3), tokens, latents, eos)[0]

    grads = jax.grad(loss_fn)(params)
    for path in (
        ("flow_net", "input_proj", "weight"),
        ("transformer", "layers", 0, "linear1", "weight"),
        ("input_linear", "weight"),
        ("out_eos", "weight"),
        ("conditioner", "embed", "weight"),
    ):
        g = grads
        for k in path:
            g = g[k]
        assert float(jnp.abs(g).max()) > 0.0, path


def test_checkpoint_roundtrip(setup, tmp_path):
    flow_lm, params = setup
    optimizer = optax.adamw(1e-3)
    state = init_train_state(flow_lm, params, optimizer)
    step = jax.jit(make_train_step(flow_lm, optimizer))
    tokens, latents, eos = _batch(flow_lm)
    state, _ = step(state, jax.random.PRNGKey(0), tokens, latents, eos)

    from pocket_tts_tpu.training.checkpoint import restore_train_state, save_train_state

    path = tmp_path / "ckpt"
    save_train_state(state, path)
    template = init_train_state(flow_lm, params, optimizer)
    restored = restore_train_state(path, template)
    assert int(restored.step) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues from the restored state
    restored, metrics = step(restored, jax.random.PRNGKey(1), tokens, latents, eos)
    assert int(restored.step) == 2
    assert np.isfinite(float(metrics["loss"]))

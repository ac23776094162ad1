"""Long copy_state=False continuation sessions: KV compaction keeps the
capacity bucket — and therefore the jit cache — stable (VERDICT round-1
item: the plain API used to reallocate/recompile per bucket; the engine
compacted but the public API did not)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.text import FallbackWordTokenizer
from pocket_tts_tpu.models.tts_model import TTSModel


def _make_model(eos_threshold: float) -> TTSModel:
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    return TTSModel(
        flow_lm=flow_lm,
        mimi=mimi,
        params=params,
        tokenizer=FallbackWordTokenizer(4000),
        temp=0.7,
        lsd_decode_steps=1,
        noise_clamp=None,
        eos_threshold=eos_threshold,
        config=cfg,
    )


@pytest.fixture()
def model():
    return _make_model(eos_threshold=1e9)


def test_continuation_compaction_stabilizes_jit_cache():
    # Always-EOS model: each continuation's VALID history is tiny (a few
    # tokens + frames_after_eos+1 frames) while `written` would grow by
    # t_pad + dispatched per call — exactly the regime where compaction must
    # keep long sessions in one capacity bucket (no new jits).
    model = _make_model(eos_threshold=-1e9)
    prompt = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 6, model.flow_lm.dim), jnp.float32)
        * 0.02
    )
    state = model._state_from_prompt(prompt)

    text = "Hi."
    audio = model.generate_audio(state, text, copy_state=False, frames_after_eos=1)
    assert audio.shape[0] > 0

    naive_written = state.written
    capacities = [model.flow_lm.state_capacity(state.tree)]
    key_snapshots = []
    for _ in range(12):
        audio = model.generate_audio(state, text, copy_state=False, frames_after_eos=1)
        naive_written += 32 + 64  # t_pad + bulk dispatch budget, per call
        assert audio.shape[0] > 0
        capacities.append(model.flow_lm.state_capacity(state.tree))
        key_snapshots.append(set(model._jit_cache.keys()))

    # Without compaction the cumulative write index would have crossed many
    # capacity buckets; compacted, capacity tracks the VALID history (which
    # this always-EOS session grows by only a few positions per call).
    final_capacity = capacities[-1]
    assert naive_written > 2 * final_capacity
    assert final_capacity <= 256  # 13 calls x ~5 valid positions + headroom
    assert state.written <= final_capacity

    # jit programs are keyed by capacity bucket: once the bucket settles (it
    # may step up once when valid history outgrows the first bucket), the
    # cache must stop growing — compile count is bounded by buckets touched,
    # never by session length.
    assert len(set(capacities)) <= 2, f"capacity thrashing: {capacities}"
    settle = capacities.index(final_capacity)
    assert key_snapshots[-1] == key_snapshots[max(settle, len(key_snapshots) - 8)], (
        "jit cache kept growing after the capacity bucket settled"
    )


def test_continuation_output_unaffected_by_compaction(model):
    """Compaction must not change what the model attends to: a continuation
    after forced compaction sees the same positions as one without."""
    prompt = (
        jax.random.normal(jax.random.PRNGKey(2), (1, 6, model.flow_lm.dim), jnp.float32)
        * 0.02
    )

    def run(compact: bool):
        state = model._state_from_prompt(prompt)
        model._rng = jax.random.PRNGKey(77)
        a1 = model.generate_audio(state, "One two.", copy_state=False, frames_after_eos=1)
        if compact:
            new_written = max(state.pos) + 1
            state.tree = model.flow_lm.compact_state(state.tree, new_written)
            state.written = new_written
        model._rng = jax.random.PRNGKey(78)
        a2 = model.generate_audio(state, "Three four.", copy_state=False, frames_after_eos=1)
        return a1, a2, list(state.pos)

    a1_ref, a2_ref, pos_ref = run(compact=False)
    a1_cmp, a2_cmp, pos_cmp = run(compact=True)
    np.testing.assert_array_equal(a1_ref, a1_cmp)
    assert pos_ref == pos_cmp
    np.testing.assert_allclose(a2_ref, a2_cmp, rtol=1e-4, atol=1e-5)

"""Parity tests for the whole-backbone Pallas decode megakernel
(ops/fused_backbone.py) against the XLA oracle path, at the real model
geometry (E=1024, H=16, L=6, FF=4096 — the kernel's chunking assumes it),
in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocket_tts_tpu.models.weights import quantize_int8
from pocket_tts_tpu.ops.fused_backbone import fused_backbone_decode, pack_backbone_int8
from pocket_tts_tpu.ops.transformer import StreamingTransformer

E, H, L, C = 1024, 16, 6, 256


@pytest.fixture(scope="module")
def setup():
    t = StreamingTransformer(
        d_model=E, num_heads=H, num_layers=L, dim_feedforward=4 * E, kind="flow_lm"
    )
    params = t.init_params(jax.random.PRNGKey(0))
    # Quantize through the production path (wrap as a fake flow_lm tree).
    q = quantize_int8(
        {"flow_lm": {"transformer": params}}, subtrees=("transformer",)
    )
    qparams = q["flow_lm"]["transformer"]
    packed = pack_backbone_int8(qparams["layers"])
    state = t.init_state(1, C, dtype=jnp.bfloat16)
    # Prefill a few positions through the oracle so caches are non-trivial.
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 17, E), jnp.float32) * 0.3
    pos = jnp.arange(17, dtype=jnp.int32)[None, :]
    _, state = t(qparams, emb, state, pos)
    return t, qparams, packed, state


@pytest.mark.parametrize(
    "attn_mode,block",
    # (vpu, quad) is the C<=512 default; (vpu, tri) is what production
    # ships for buckets past C=512 (the dispatcher demotes quad there);
    # the others pin the opt-in forms.
    [
        ("mxu", "pair"),
        ("vpu", "pair"),
        ("vpu", "quad"),
        ("vpu", "tri"),
    ],
)
def test_kernel_matches_oracle_step(setup, attn_mode, block):
    t, qparams, packed, state = setup
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, E), jnp.float32) * 0.5
    positions = jnp.full((1, 1), 17, jnp.int32)

    ref_out, ref_state = t(qparams, x, state, positions)

    from pocket_tts_tpu.ops.rope import rope_angles

    cos, sin = rope_angles(positions, E // H)
    widx = int(state["widx"])
    y, new_ks, new_vs = fused_backbone_decode(
        packed,
        x[:, 0, :],
        tuple(l["k"] for l in state["layers"]),
        tuple(l["v"] for l in state["layers"]),
        state["layers"][0]["slot_pos"],
        positions[:, 0],
        cos[0, 0, 0],
        sin[0, 0, 0],
        widx=jnp.full((1,), widx, jnp.int32),
        num_heads=H,
        interpret=True,
        attn_mode=attn_mode,
        block=block,
    )
    np.testing.assert_allclose(
        np.asarray(y[0]), np.asarray(ref_out[0, 0]), rtol=0, atol=2e-2
    )
    # The kernel appends in place: the FULL updated caches (prefix history,
    # the new row at widx, untouched tail) must match the oracle's.
    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(new_ks[i], np.float32),
            np.asarray(ref_state["layers"][i]["k"][0], np.float32),
            atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(new_vs[i], np.float32),
            np.asarray(ref_state["layers"][i]["v"][0], np.float32),
            atol=2e-2,
        )


def test_fused_path_wiring_matches_oracle(setup, monkeypatch):
    """The `fused` params key routes T=1 B=1 decode through the kernel and
    produces the same next state as the oracle."""
    t, qparams, packed, state = setup
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, E), jnp.float32) * 0.5
    positions = jnp.full((1, 1), 17, jnp.int32)

    ref_out, ref_state = t(qparams, x, state, positions)

    import pocket_tts_tpu.ops.fused_backbone as fb

    # Pin the exact (bf16-activation) kernel mode: this test checks the
    # wiring at tight tolerance; int8-act parity has its own looser test.
    monkeypatch.setenv("POCKET_TTS_FUSED_INT8_ACT", "0")
    orig = fb.fused_backbone_decode
    monkeypatch.setattr(
        fb, "fused_backbone_decode", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    fused_params = {**qparams, "fused": packed}
    out, new_state = t(fused_params, x, state, positions)

    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(ref_out[0, 0]), atol=2e-2
    )
    assert int(new_state["widx"]) == int(ref_state["widx"])
    widx = int(state["widx"])
    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(new_state["layers"][i]["k"][0, :, widx, :], np.float32),
            np.asarray(ref_state["layers"][i]["k"][0, :, widx, :], np.float32),
            atol=2e-2,
        )
        sp = np.asarray(new_state["layers"][i]["slot_pos"])
        np.testing.assert_array_equal(sp, np.asarray(ref_state["layers"][i]["slot_pos"]))


def test_capacity_guard_falls_back_to_oracle(setup):
    """Past the kernel's VMEM budget (8 MB of KV scratch) the fused branch
    must not be taken — it would fail to compile on a real TPU."""
    import jax.numpy as jnp

    t, qparams, packed, _ = setup
    big = t.init_state(1, 4096, dtype=jnp.bfloat16)
    small = t.init_state(1, 256, dtype=jnp.bfloat16)
    assert not t._fused_capacity_ok(big)
    assert t._fused_capacity_ok(small)

    # And the dispatch respects it: a fused-params call at huge capacity
    # runs the XLA path (no pallas_call traced -> works on CPU untouched).
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, E), jnp.float32)
    pos = jnp.zeros((1, 1), jnp.int32)
    fused_params = {**qparams, "fused": packed}
    out, _ = t(fused_params, x, big, pos)
    ref, _ = t(qparams, x, big, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_kernel_int8_act_parity(setup):
    """int8 activation quantization (MXU int8 x int8 path): ~1% relative
    error vs the weight-only-int8 oracle — the dynamic per-matmul activation
    scale costs one extra rounding per projection."""
    t, qparams, packed, state = setup
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, E), jnp.float32) * 0.5
    positions = jnp.full((1, 1), 17, jnp.int32)
    ref_out, ref_state = t(qparams, x, state, positions)

    from pocket_tts_tpu.ops.rope import rope_angles

    cos, sin = rope_angles(positions, E // H)
    widx = int(state["widx"])
    y, new_ks, new_vs = fused_backbone_decode(
        packed,
        x[:, 0, :],
        tuple(l["k"] for l in state["layers"]),
        tuple(l["v"] for l in state["layers"]),
        state["layers"][0]["slot_pos"],
        positions[:, 0],
        cos[0, 0, 0],
        sin[0, 0, 0],
        widx=jnp.full((1,), widx, jnp.int32),
        num_heads=H,
        interpret=True,
        int8_act=True,
    )
    ref = np.asarray(ref_out[0, 0])
    err = np.abs(np.asarray(y[0]) - ref)
    assert err.max() < 0.12, err.max()          # absolute ceiling
    assert err.max() / np.abs(ref).max() < 0.03  # ~1% relative, margin 3x
    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(new_ks[i], np.float32),
            np.asarray(ref_state["layers"][i]["k"][0], np.float32),
            atol=0.12,
        )


def test_vpu_attention_bitwise_matches_mxu(setup):
    """The VPU elementwise-multiply attention form (production default) is
    bitwise-identical to the per-head MXU form: f32 multiplication of
    cache-dtype values is exact."""
    t, qparams, packed, state = setup
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 1, E), jnp.float32) * 0.5
    positions = jnp.full((1, 1), 17, jnp.int32)

    from pocket_tts_tpu.ops.rope import rope_angles

    cos, sin = rope_angles(positions, E // H)
    args = (
        packed,
        x[:, 0, :],
        tuple(l["k"] for l in state["layers"]),
        tuple(l["v"] for l in state["layers"]),
        state["layers"][0]["slot_pos"],
        positions[:, 0],
        cos[0, 0, 0],
        sin[0, 0, 0],
    )
    widx = jnp.full((1,), int(state["widx"]), jnp.int32)
    y_mxu, k_m, v_m = fused_backbone_decode(
        *args, widx=widx, num_heads=H, interpret=True, attn_mode="mxu"
    )
    y_vpu, k_v, v_v = fused_backbone_decode(
        *args, widx=widx, num_heads=H, interpret=True, attn_mode="vpu"
    )
    np.testing.assert_array_equal(np.asarray(y_mxu), np.asarray(y_vpu))
    np.testing.assert_array_equal(np.asarray(k_m), np.asarray(k_v))
    np.testing.assert_array_equal(np.asarray(v_m), np.asarray(v_v))


@pytest.mark.parametrize("bos", [False, True])
# quad is the C<=512 production default; pair is what select_modes ships
# for head mode past C=512; tri pins the opt-in form.
@pytest.mark.parametrize("block", ["quad", "pair", "tri"])
def test_fused_step_matches_head_oracle(setup, bos, block):
    """The head-folded kernel (fused_backbone_step: latent/BOS select ->
    input_linear -> backbone -> out_norm -> EOS logit, plus the in-kernel
    slot_pos append) matches the XLA head math from flow_lm.decode_step
    (models/flow_lm.py:186-198)."""
    from pocket_tts_tpu.ops.fused_backbone import (
        fused_backbone_step,
        pack_backbone_head,
    )
    from pocket_tts_tpu.ops.linear import linear
    from pocket_tts_tpu.ops.norms import layer_norm
    from pocket_tts_tpu.ops.rope import rope_angles

    t, qparams, packed, state = setup
    ldim = 32
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 5)
    flow_params = {
        "input_linear": {
            "weight": jax.random.normal(ks[0], (E, ldim), jnp.float32) * 0.1
        },
        "out_norm": {
            "weight": 1.0 + 0.1 * jax.random.normal(ks[1], (E,), jnp.float32),
            "bias": 0.1 * jax.random.normal(ks[2], (E,), jnp.float32),
        },
        "out_eos": {
            "weight": jax.random.normal(ks[3], (1, E), jnp.float32) * 0.03,
            "bias": jnp.full((1,), 0.25, jnp.float32),
        },
        "bos_emb": jax.random.normal(ks[4], (ldim,), jnp.float32),
    }
    head_packed = pack_backbone_head(flow_params)
    latent = jax.random.normal(jax.random.PRNGKey(12), (1, ldim), jnp.float32)
    is_bos = jnp.full((1,), bos, jnp.bool_)
    positions = jnp.full((1, 1), 17, jnp.int32)

    # Oracle: the decode_step head math around the oracle transformer.
    seq = jnp.where(is_bos[:, None], flow_params["bos_emb"][None, :], latent)
    x = linear(seq[:, None, :], flow_params["input_linear"]["weight"])
    ref_h, ref_state = t(qparams, x, state, positions)
    ref_h = layer_norm(
        ref_h, flow_params["out_norm"]["weight"], flow_params["out_norm"]["bias"],
        eps=1e-5,
    ).astype(jnp.float32)[:, -1]
    ref_eos = linear(
        ref_h, flow_params["out_eos"]["weight"], flow_params["out_eos"]["bias"]
    )[:, 0]

    widx = int(state["widx"])
    cos, sin = rope_angles(positions, E // H)
    h, eos_logit, new_ks, new_vs, spnew = fused_backbone_step(
        packed,
        head_packed,
        latent,
        is_bos,
        tuple(l["k"] for l in state["layers"]),
        tuple(l["v"] for l in state["layers"]),
        state["layers"][0]["slot_pos"],
        positions[:, 0],
        cos[0, 0, 0],
        sin[0, 0, 0],
        jnp.full((1,), widx, jnp.int32),
        num_heads=H,
        interpret=True,
        attn_mode="vpu",
        block=block,
    )
    np.testing.assert_allclose(
        np.asarray(h[0]), np.asarray(ref_h[0]), rtol=0, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(eos_logit), np.asarray(ref_eos), rtol=0, atol=2e-2
    )
    # Full updated caches and the appended slot position.
    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(new_ks[i], np.float32),
            np.asarray(ref_state["layers"][i]["k"][0], np.float32),
            atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(new_vs[i], np.float32),
            np.asarray(ref_state["layers"][i]["v"][0], np.float32),
            atol=2e-2,
        )
    np.testing.assert_array_equal(
        np.asarray(spnew), np.asarray(ref_state["layers"][0]["slot_pos"])
    )


@pytest.mark.parametrize(
    "subtrees",
    # ("transformer", "input_linear") is the quantize_int8 DEFAULT — what
    # production serves — and exercises the int8 head packing (raw int8
    # codes in `win` + the in-kernel hw[4] scale row); the transformer-only
    # variant pins the float input_linear path (ADVICE r3).
    [("transformer",), ("transformer", "input_linear")],
)
def test_decode_step_fused_dispatch_matches_xla(monkeypatch, subtrees):
    """The PRODUCTION dispatch path — flow_lm.decode_step routing through
    the head-folded kernel (POCKET_TTS_FUSED_INTERPRET drives it in Pallas
    interpret mode on CPU) — matches the XLA decode_step over consecutive
    steps: latents, EOS, positions, caches, and the shared slot_pos."""
    from pocket_tts_tpu.config.schema import FlowLMConfig
    from pocket_tts_tpu.models.flow_lm import FlowLMModel
    from pocket_tts_tpu.ops.fused_backbone import (
        pack_backbone_head,
        pack_backbone_int8,
    )
    from pocket_tts_tpu.ops.sampling import sample_noise

    cfg = FlowLMConfig(
        dtype="float32",
        flow={"depth": 1, "dim": 64},
        transformer={
            "d_model": E,
            "hidden_scale": 4,
            "max_period": 10000,
            "num_heads": H,
            "num_layers": L,
        },
        lookup_table={
            "dim": E,
            "n_bins": 100,
            "tokenizer": "sentencepiece",
            "tokenizer_path": "unavailable://",
        },
    )
    flow_lm = FlowLMModel(config=cfg, latent_dim=32)
    params = flow_lm.init_params(jax.random.PRNGKey(0))
    q = quantize_int8({"flow_lm": params}, subtrees=subtrees)["flow_lm"]
    if "input_linear" in subtrees:
        assert "q" in q["input_linear"]["weight"]
    state0 = flow_lm.init_state(1, C, dtype=jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 9, E), jnp.float32) * 0.3
    state0 = flow_lm.prefill(q, state0, emb, jnp.full((1,), 9, jnp.int32))

    fused_params = dict(q)
    fused_params["transformer"] = dict(q["transformer"])
    fused_params["transformer"]["fused"] = pack_backbone_int8(
        q["transformer"]["layers"]
    )
    fused_params["transformer"]["fused_head"] = pack_backbone_head(q)
    monkeypatch.setenv("POCKET_TTS_FUSED_INTERPRET", "1")
    assert flow_lm._fused_step_ok(fused_params, state0, 1)
    assert not flow_lm._fused_step_ok(q, state0, 1)  # no packed weights -> XLA

    rng = jax.random.PRNGKey(3)
    s_ref, s_fus = state0, state0
    latent_ref = latent_fus = jnp.zeros((1, 32), jnp.float32)
    for step in range(3):
        is_bos = jnp.full((1,), step == 0, jnp.bool_)
        noise = sample_noise(jax.random.fold_in(rng, step), (1, 32), 0.7, None)
        s_ref, latent_ref, eos_ref = flow_lm.decode_step(
            q, s_ref, latent_ref, is_bos, rng, 0.7, 1, None, 1e9, noise=noise
        )
        s_fus, latent_fus, eos_fus = flow_lm.decode_step(
            fused_params, s_fus, latent_fus, is_bos, rng, 0.7, 1, None, 1e9,
            noise=noise,
        )
        np.testing.assert_allclose(
            np.asarray(latent_fus), np.asarray(latent_ref), rtol=0, atol=2e-2
        )
        np.testing.assert_array_equal(np.asarray(eos_fus), np.asarray(eos_ref))
    np.testing.assert_array_equal(np.asarray(s_fus["pos"]), np.asarray(s_ref["pos"]))
    assert int(s_fus["transformer"]["widx"]) == int(s_ref["transformer"]["widx"])
    for i in range(L):
        np.testing.assert_array_equal(
            np.asarray(s_fus["transformer"]["layers"][i]["slot_pos"]),
            np.asarray(s_ref["transformer"]["layers"][i]["slot_pos"]),
        )
        np.testing.assert_allclose(
            np.asarray(s_fus["transformer"]["layers"][i]["k"], np.float32),
            np.asarray(s_ref["transformer"]["layers"][i]["k"], np.float32),
            atol=2e-2,
        )


def test_probe_per_bucket_demotion(monkeypatch):
    """A (simulated) Mosaic rejection specific to one capacity bucket must
    degrade THAT bucket only, at probe time, with the other buckets' kernels
    intact — and the dispatch gates must route accordingly (VERDICT r3
    item 4: the old probe hardcoded C=512, so a C=1024-only rejection
    surfaced on a live long-utterance request)."""
    from types import SimpleNamespace

    from pocket_tts_tpu.models.tts_model import _probe_fused_compile
    from pocket_tts_tpu.ops import fused_backbone as fb
    from pocket_tts_tpu.ops import fused_segment as fs

    class _Lowered:
        def __init__(self, fail):
            self.fail = fail

        def compile(self):
            if self.fail:
                raise RuntimeError("Mosaic: scoped vmem limit exceeded (injected)")

    def fake(fail_fn):
        def lower(*args, **kwargs):
            C = next(
                a[0].shape[1]
                for a in args
                if isinstance(a, tuple) and hasattr(a[0], "shape") and a[0].ndim == 4
            )
            return _Lowered(fail_fn(C, kwargs.get("block")))

        return SimpleNamespace(lower=lower)

    def run_probe(fail_fn):
        fb.reset_bucket_modes()
        monkeypatch.setattr(fb, "fused_backbone_decode", fake(fail_fn))
        monkeypatch.setattr(fb, "fused_backbone_step", fake(fail_fn))
        monkeypatch.setattr(fs, "fused_segment_decode", fake(fail_fn))
        tcfg = SimpleNamespace(d_model=E, num_heads=H, num_layers=L)
        model = SimpleNamespace(
            params={
                "flow_lm": {
                    "transformer": {"fused": 1, "fused_head": 1, "fused_segment": 1}
                }
            },
            flow_lm=SimpleNamespace(config=SimpleNamespace(transformer=tcfg), ldim=32),
            state_dtype=jnp.bfloat16,
        )
        _probe_fused_compile(model, capacities=(512, 1024))
        return model.params["flow_lm"]["transformer"]

    # Scenario 1: every block layout fails at C=1024; C=512 is clean.
    t = run_probe(lambda C, blk: C == 1024)
    assert "fused" in t and "fused_head" in t and "fused_segment" in t
    assert fb.bucket_mode("body", 512) is not None
    assert fb.bucket_mode("body", 1024) is None
    assert fb.bucket_mode("head", 1024) is None
    assert fb.bucket_mode("segment", 1024) is None
    # The dispatch gates honor the per-bucket verdicts (static thresholds
    # would have allowed both buckets).
    from pocket_tts_tpu.ops.transformer import StreamingTransformer

    def state_at(C):
        return {"layers": [{"k": jnp.zeros((1, C, H, E // H), jnp.bfloat16)}]}

    assert StreamingTransformer._fused_capacity_ok(state_at(512))
    assert not StreamingTransformer._fused_capacity_ok(state_at(1024))
    assert not StreamingTransformer._fused_capacity_ok(state_at(1024), kind="head")

    # Scenario 2: only the larger block layouts fail at C=1024 -> the probe
    # records the demoted block and select_modes serves it.
    t = run_probe(lambda C, blk: C == 1024 and blk in ("quad", "tri"))
    kvb_1024 = 2 * 1024 * E * 2
    assert fb.bucket_mode("body", 1024) == "pair"
    assert fb.select_modes(kvb_1024, 1024) == (fb.fused_attn_mode(), "pair")
    assert fs.segment_block_mode(kvb_1024, capacity=1024) == "pair"
    assert StreamingTransformer._fused_capacity_ok(state_at(1024))

    # Scenario 3: everything fails everywhere -> packed layouts dropped.
    t = run_probe(lambda C, blk: True)
    assert "fused" not in t and "fused_head" not in t and "fused_segment" not in t

    fb.reset_bucket_modes()  # do not leak verdicts into other tests

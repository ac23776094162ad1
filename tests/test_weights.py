"""Checkpoint I/O tests: safetensors roundtrip, torch-name mapping, layouts."""

import numpy as np
import jax
import pytest

from tiny_config import tiny_config
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.weights import load_state_dict
from pocket_tts_tpu.ops.conv import convtr_weight_from_torch
from pocket_tts_tpu.utils.safetensors import load_safetensors, save_safetensors

RNG = np.random.default_rng(21)


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a.weight": RNG.standard_normal((4, 3)).astype(np.float32),
        "b.bias": RNG.standard_normal(7).astype(np.float16),
        "c.idx": np.arange(5, dtype=np.int64),
        "d.flag": np.array([True, False]),
    }
    path = tmp_path / "x.safetensors"
    save_safetensors(path, tensors)
    loaded = load_safetensors(path)
    assert set(loaded) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(loaded[k], tensors[k])


def test_safetensors_bf16_decode(tmp_path):
    """BF16 payloads decode by widening to f32 (bit-shift semantics)."""
    import json

    vals = np.array([1.0, -2.5, 3.14159, 1e-3], dtype=np.float32)
    u32 = vals.view(np.uint32)
    bf16 = ((u32 + 0x8000) >> 16).astype(np.uint16)  # round-to-nearest-even-ish
    header = {"t": {"dtype": "BF16", "shape": [4], "data_offsets": [0, 8]}}
    hb = json.dumps(header).encode()
    path = tmp_path / "bf16.safetensors"
    with open(path, "wb") as f:
        f.write(len(hb).to_bytes(8, "little"))
        f.write(hb)
        f.write(bf16.tobytes())
    loaded = load_safetensors(path)["t"]
    assert loaded.dtype == np.float32
    np.testing.assert_allclose(loaded, vals, rtol=1e-2)


@pytest.fixture(scope="module")
def models():
    cfg = tiny_config()
    flow_lm = FlowLMModel(config=cfg.flow_lm, latent_dim=cfg.mimi.quantizer.dimension)
    mimi = MimiModel(config=cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return flow_lm, mimi, {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}


def test_load_torch_named_tensors(models):
    """Combined-checkpoint keys (torch module paths) land in the right leaves,
    with the convtr layout conversion applied."""
    flow_lm, mimi, params = models

    lin = RNG.standard_normal((flow_lm.dim, flow_lm.ldim)).astype(np.float32)
    # Mimi decoder layer 2 is the first ConvTranspose (index 1 is the ELU) (ratio 6 -> k=12, s=6).
    convtr_shape_ours = np.asarray(params["mimi"]["decoder"]["model"][2]["convtr"]["weight"]).shape
    cout, cin_per_g, k = convtr_shape_ours
    w_torch = RNG.standard_normal((cin_per_g, cout, k)).astype(np.float32)  # (in, out, k), g=1

    flat = {
        "flow_lm.input_linear.weight": lin,
        "mimi.decoder.model.2.convtr.weight": w_torch,
        "flow_lm.condition_provider.conditioners.transcript_in_segment.embed.weight": (
            RNG.standard_normal((4001, flow_lm.dim)).astype(np.float32)
        ),
        "flow_lm.condition_provider.conditioners.speaker_wavs.output_proj.weight": (
            RNG.standard_normal((flow_lm.dim, 512)).astype(np.float32)
        ),
        "flow_lm.condition_provider.conditioners.transcript_in_segment.learnt_padding": (
            RNG.standard_normal((1, 1, flow_lm.dim)).astype(np.float32)
        ),
        "flow_lm.flow.w_s_t.something": np.zeros(3, np.float32),
        "mimi.quantizer.vq.codebook": np.zeros((4, 4), np.float32),
        "totally.unknown.key": np.zeros(2, np.float32),
    }
    loaded, skipped = load_state_dict(params, flat)
    assert loaded == 4
    assert skipped == 4

    np.testing.assert_array_equal(np.asarray(params["flow_lm"]["input_linear"]["weight"]), lin)
    np.testing.assert_array_equal(
        np.asarray(params["flow_lm"]["conditioner"]["embed"]["weight"]),
        flat["flow_lm.condition_provider.conditioners.transcript_in_segment.embed.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["flow_lm"]["speaker_proj_weight"]),
        flat["flow_lm.condition_provider.conditioners.speaker_wavs.output_proj.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["mimi"]["decoder"]["model"][2]["convtr"]["weight"]),
        convtr_weight_from_torch(w_torch, groups=1),
    )


def test_shape_mismatch_skipped(models):
    _, _, params = models
    before = np.asarray(params["flow_lm"]["out_eos"]["weight"]).copy()
    flat = {"flow_lm.out_eos.weight": np.zeros((5, 5), np.float32)}
    loaded, skipped = load_state_dict(params, flat)
    assert loaded == 0 and skipped == 1
    np.testing.assert_array_equal(np.asarray(params["flow_lm"]["out_eos"]["weight"]), before)


def test_mimi_prefix_strip(models):
    """Separate mimi checkpoints carry a 'model.' prefix (reference:
    weight_conversion.py:125-134)."""
    _, mimi, params = models
    q = np.asarray(params["mimi"]["quantizer"]["output_proj"]["weight"])
    new = RNG.standard_normal(q.shape).astype(np.float32)
    loaded, _ = load_state_dict(
        params["mimi"], {"model.quantizer.output_proj.weight": new}, strip_prefix="model."
    )
    assert loaded == 1
    np.testing.assert_array_equal(
        np.asarray(params["mimi"]["quantizer"]["output_proj"]["weight"]), new
    )


def test_save_checkpoint_roundtrip(models, tmp_path):
    """save_checkpoint -> load_state_dict must reproduce every tensor,
    including the convtr layout double conversion."""
    import jax.numpy as jnp

    flow_lm, mimi, params = models
    from pocket_tts_tpu.models.weights import save_checkpoint

    path = tmp_path / "ckpt.safetensors"
    n = save_checkpoint(params, path)
    assert n > 50

    k1, k2 = jax.random.split(jax.random.PRNGKey(99))
    fresh = {"flow_lm": flow_lm.init_params(k1), "mimi": mimi.init_params(k2)}
    flat = load_safetensors(path)
    loaded, skipped = load_state_dict(fresh, flat)
    assert skipped == 0 and loaded == n

    for key in ("flow_lm", "mimi"):
        ours = jax.tree_util.tree_leaves(params[key])
        theirs = jax.tree_util.tree_leaves(fresh[key])
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resblock_in_ln_weights_load(models):
    """The checkpoint's affine in_ln LayerNorm params must land (the reference
    ResBlock declares an affine LayerNorm, mlp.py:82); silently skipping them
    would change the flow head's function."""
    flow_lm, _, params = models
    dim = flow_lm.config.flow.dim
    w = RNG.standard_normal(dim).astype(np.float32)
    b = RNG.standard_normal(dim).astype(np.float32)
    flat = {
        "flow_lm.flow_net.res_blocks.0.in_ln.weight": w,
        "flow_lm.flow_net.res_blocks.0.in_ln.bias": b,
    }
    loaded, skipped = load_state_dict(params, flat)
    assert loaded == 2 and skipped == 0
    np.testing.assert_array_equal(
        np.asarray(params["flow_lm"]["flow_net"]["res_blocks"][0]["in_ln"]["weight"]), w
    )

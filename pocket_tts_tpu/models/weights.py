"""Checkpoint loading: torch-layout safetensors -> parameter pytrees.

The published pocket-tts checkpoints store torch module paths; our parameter
pytrees mirror those paths (dicts for attributes, lists for indexed
sub-modules), so loading is a generic tree walk. Key renames and skip rules
replicate the reference loaders
(reference: pocket_tts_mlx/utils/weight_conversion.py:102-134 and the
combined-checkpoint walker at pocket_tts_mlx/models/tts_model.py:153-194).

Layout conversions at load time:
  - Linear / Embedding / Conv1d weights: used as-is (we compute in torch layout)
  - ConvTranspose1d weights (any path containing 'convtr'): converted once to
    grad-conv layout (see ops/conv.convtr_weight_from_torch)
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.ops.conv import convtr_weight_from_torch

logger = logging.getLogger(__name__)

_SKIP_PREFIXES = (
    "flow.w_s_t.",
    "flow_lm.flow.w_s_t.",
    "quantizer.vq.",
    "model.quantizer.vq.",
    "mimi.quantizer.vq.",
)
_SKIP_EXACT = (
    "condition_provider.conditioners.transcript_in_segment.learnt_padding",
    "condition_provider.conditioners.speaker_wavs.learnt_padding",
    "quantizer.logvar_proj.weight",
    "model.quantizer.logvar_proj.weight",
)
_RENAMES = {
    "condition_provider.conditioners.transcript_in_segment.embed.weight": "conditioner.embed.weight",
    "condition_provider.conditioners.speaker_wavs.output_proj.weight": "speaker_proj_weight",
}


def is_expected_skip(key: str) -> bool:
    """True when a checkpoint tensor is KNOWN to be droppable (the reference
    loaders drop exactly these: VQ codebooks, flow.w_s_t, learnt paddings,
    logvar_proj — weight_conversion.py:102-134). The checkpoint-parity gate
    (tests/test_checkpoint_parity.py) asserts every skipped key passes this."""
    for prefix in ("model.", "flow_lm.", "mimi."):
        if key.startswith(prefix):
            key = key[len(prefix):]
            break
    return any(key.startswith(p) for p in _SKIP_PREFIXES) or key in _SKIP_EXACT


def _normalize_key(key: str) -> str | None:
    """Apply skip rules and renames; None means the tensor is dropped."""
    prefix, bare = "", key
    for candidate in ("flow_lm.", "mimi."):
        if key.startswith(candidate):
            prefix, bare = candidate, key[len(candidate):]
            break
    if any(bare.startswith(p) for p in _SKIP_PREFIXES) or bare in _SKIP_EXACT:
        return None
    if bare in _RENAMES:
        return prefix + _RENAMES[bare]
    return key


def _resolve(tree, parts: list[str]):
    """Walk a params pytree by dotted-path parts; returns (parent, leaf_key)
    or None when the path doesn't exist (tensor is skipped, matching the
    reference's lenient walker)."""
    node = tree
    for part in parts[:-1]:
        if part.isdigit() and isinstance(node, (list, tuple)):
            idx = int(part)
            if idx >= len(node):
                return None
            node = node[idx]
        elif isinstance(node, dict) and part in node:
            node = node[part]
        else:
            return None
    last = parts[-1]
    if last.isdigit():
        return None
    if not isinstance(node, dict) or last not in node:
        return None
    return node, last


def _convert(path: str, tensor: np.ndarray, target) -> np.ndarray | None:
    """Convert a torch tensor to our storage layout for the given path."""
    target_shape = tuple(target.shape)
    if ".convtr." in path or path.endswith("convtr.weight"):
        if tensor.ndim == 3:
            groups = tensor.shape[0] // target_shape[1]
            tensor = convtr_weight_from_torch(tensor, groups=groups)
    if path.endswith("in_proj.weight") and tensor.ndim == 2 and len(target_shape) == 3:
        # Packed qkv rows [3E, E] -> [3, E, E] (bit-identical view; the
        # leading axis makes attention-head TP a plain PartitionSpec).
        if tensor.shape[0] == target_shape[0] * target_shape[1]:
            tensor = tensor.reshape(target_shape)
    if tuple(tensor.shape) != target_shape:
        logger.warning(
            "Shape mismatch for %s: checkpoint %s vs model %s — skipped",
            path,
            tensor.shape,
            target_shape,
        )
        return None
    return tensor


def cast_serving_dtype(params: dict, dtype) -> dict:
    """Cast matmul/conv weights (>=2-D) to a serving dtype, keeping float32
    islands: the flow-matching head and the EOS/norm outputs, whose precision
    feeds the ODE integration directly, plus all 1-D tensors (biases, norm
    scales, emb_std/emb_mean, bos_emb)."""
    islands = {"flow_net", "out_eos", "out_norm"}

    def cast(path, leaf):
        keys = {getattr(part, "key", None) for part in path}
        if keys & islands:
            return leaf
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.dtype == jnp.float32:
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params)


def quantize_int8(params: dict, subtrees=("transformer", "input_linear")) -> dict:
    """Weight-only int8 quantization of the FlowLM decode hot path.

    Every 2-D float weight under params["flow_lm"][<subtree>] (the backbone's
    in_proj/out_proj/linear1/linear2 and the latent input projection — the
    tensors re-read from HBM on EVERY decode frame) is replaced by
    {"q": int8 [out, in], "s": float32 [out]} with per-output-channel
    symmetric scales; ops/linear.linear applies the scale to the f32
    accumulator after the matmul, so the math equals a dequantized-weight
    matmul while HBM weight traffic halves vs bf16. 1-D tensors (norms,
    biases) and the precision-sensitive islands (flow head, out_norm,
    out_eos; see cast_serving_dtype) are untouched, as are the conditioner
    embedding (read only at prefill) and all of Mimi (read once per vocoded
    segment, amortized over S frames).
    """

    def q(tree):
        if isinstance(tree, dict):
            out = {}
            for k, leaf in tree.items():
                if (
                    k == "weight"
                    and hasattr(leaf, "ndim")
                    and leaf.ndim in (2, 3)  # [out, in] linears; [3, E, E] qkv
                    and jnp.issubdtype(leaf.dtype, jnp.floating)
                ):
                    w = leaf.astype(jnp.float32)
                    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-12) / 127.0
                    qw = jnp.clip(jnp.round(w / scale[..., None]), -127, 127).astype(jnp.int8)
                    out[k] = {"q": qw, "s": scale}
                else:
                    out[k] = q(leaf)
            return out
        if isinstance(tree, (list, tuple)):
            return type(tree)(q(x) for x in tree)
        return tree

    new_params = dict(params)
    new_flow = dict(params["flow_lm"])
    for name in subtrees:
        new_flow[name] = q(new_flow[name])
    new_params["flow_lm"] = new_flow
    return new_params


def load_state_dict(
    params: dict,
    flat: Dict[str, np.ndarray],
    dtype=jnp.float32,
    strip_prefix: str = "",
    skipped_keys: list | None = None,
) -> tuple[int, int]:
    """Assign a flat {torch_name: array} dict into a params pytree in place.

    Returns (loaded, skipped) counts. Unknown keys are skipped (the combined
    checkpoint contains training-only tensors the runtime never uses); pass a
    list as `skipped_keys` to collect their names (the checkpoint-parity gate
    asserts every skip matches a known-droppable pattern)."""
    loaded = skipped = 0
    for key, tensor in flat.items():
        original_key = key
        if strip_prefix and key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        norm = _normalize_key(key)
        if norm is None:
            resolved = None
        else:
            resolved = _resolve(params, norm.split("."))
        if resolved is None:
            skipped += 1
            if skipped_keys is not None:
                skipped_keys.append(original_key)
            continue
        parent, leaf = resolved
        converted = _convert(norm, np.asarray(tensor), parent[leaf])
        if converted is None:
            skipped += 1
            if skipped_keys is not None:
                skipped_keys.append(original_key)
            continue
        parent[leaf] = jnp.asarray(converted, dtype=dtype if converted.dtype.kind == "f" else None)
        loaded += 1
    return loaded, skipped


def convtr_weight_to_torch(w: np.ndarray, groups: int = 1) -> np.ndarray:
    """Inverse of convtr_weight_from_torch: (out, in/g, k) flipped -> (in, out/g, k)."""
    cout, cin_per_g, k = w.shape
    w = np.ascontiguousarray(w[:, :, ::-1]).reshape(groups, cout // groups, cin_per_g, k)
    return np.ascontiguousarray(np.transpose(w, (0, 2, 1, 3))).reshape(
        groups * cin_per_g, cout // groups, k
    )


def flatten_params(params, prefix: str = "") -> Dict[str, np.ndarray]:
    """Pytree -> flat {dotted_name: np.ndarray} in our storage layout."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for key, value in node.items():
                walk(value, f"{path}.{key}" if path else key)
        elif isinstance(node, (list, tuple)):
            for idx, value in enumerate(node):
                walk(value, f"{path}.{idx}")
        elif node is not None:
            flat[path] = np.asarray(node)

    walk(params, prefix)
    return flat


def save_checkpoint(params: dict, path, convtr_groups_lookup=None) -> int:
    """Write a params pytree as a torch-layout safetensors checkpoint.

    ConvTranspose weights (paths containing 'convtr') are converted back to
    torch layout so the file round-trips through load_state_dict and is also
    loadable by the reference implementations. Low-precision leaves are
    widened to float32. Returns the tensor count.
    """
    from pocket_tts_tpu.utils.safetensors import save_safetensors

    flat = flatten_params(params)
    if any(key.endswith("weight.q") for key in flat):
        raise ValueError(
            "Cannot save an int8-quantized model as a checkpoint (quantization "
            "is lossy); load with param_dtype='float32' to export."
        )
    out: Dict[str, np.ndarray] = {}
    for key, tensor in flat.items():
        if str(tensor.dtype) == "bfloat16":  # ml_dtypes bf16 -> widen for the file
            tensor = tensor.astype(np.float32)
        if (".convtr." in key or key.endswith("convtr.weight")) and key.endswith("weight") and tensor.ndim == 3:
            cout, cin_per_g, k = tensor.shape
            # groups recoverable from shape for depthwise (cin_per_g == 1),
            # else dense (groups=1) — the only two cases in this model family.
            groups = cout if cin_per_g == 1 else 1
            tensor = convtr_weight_to_torch(tensor, groups=groups)
        if key.endswith("in_proj.weight") and tensor.ndim == 3:
            tensor = tensor.reshape(-1, tensor.shape[-1])  # back to torch [3E, E]
        out[key] = tensor
    save_safetensors(path, out)
    logger.info("Saved %d tensors to %s", len(out), path)
    return len(out)


def load_predefined_voice(voice_name: str) -> np.ndarray:
    """Fetch a predefined voice's conditioning tensor [1, T, 1024]
    (reference: pocket_tts_mlx/utils/weight_conversion.py:78-89)."""
    from pocket_tts_tpu.models.tts_model import PREDEFINED_VOICES
    from pocket_tts_tpu.utils.assets import download_if_necessary
    from pocket_tts_tpu.utils.safetensors import load_safetensors

    if voice_name not in PREDEFINED_VOICES:
        raise ValueError(
            f"Predefined voice '{voice_name}' not found, available voices are "
            f"{list(PREDEFINED_VOICES)}."
        )
    tensors = load_safetensors(download_if_necessary(PREDEFINED_VOICES[voice_name]))
    if "audio_prompt" not in tensors:
        raise KeyError("audio_prompt not found in voice embedding file")
    return tensors["audio_prompt"]

"""Multi-chip layout: device mesh + sharding rules.

The reference has no distributed code at all (SURVEY §2.3); this module is
the TPU-native scaling story. The model is small (~110M params), so the
primary axis is **dp** — shard the *batch of concurrent streams* across chips
over ICI; all per-stream state (KV caches, ring buffers, conv overlaps,
positions, decode carry) carries the batch in dim 0 by construction, so one
rule shards the entire state pytree. **tp** additionally shards the
feed-forward weights Megatron-style (row-parallel linear1, column-parallel
linear2), letting XLA insert the reduce over ICI.

All of this composes with jit: inputs carry NamedShardings, GSPMD propagates
through the fused generate step and the training step unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Create a (dp, tp) mesh. dp shards streams; tp shards feed-forward."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * tp, f"need {dp * tp} devices, have {len(devices)}"
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def _param_spec_for_path(path, leaf=None) -> P:
    """Megatron-style sharding; everything else replicated.

    linear1.weight [ffn, d_model] -> rows over tp (row-parallel)
    linear2.weight [d_model, ffn] -> cols over tp (column-parallel, XLA
    inserts the psum on the contraction)
    in_proj.weight [3, E, E]      -> head-major output axis over tp: real
    attention-head partitioning (q/k/v projections, RoPE, cache update and
    softmax(QK^T)V all run on each device's own head group; no gathers)
    out_proj.weight [E, E]        -> cols over tp (contraction psum)
    """
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    ndim = getattr(leaf, "ndim", 2)
    if "in_proj" in keys:
        # [3, E, E] packed qkv: shard the head-major output axis -> real
        # attention-head TP (q/k/v/heads partition; the [B,T,3,H,d] reshape
        # splits the sharded axis with no collective). int8 scale is [3, F].
        if ndim == 3:
            return P(None, "tp", None)
        return P(None, "tp") if ndim == 2 else P()
    if "linear1" in keys:
        # int8-quantized leaves: q [out, in] shards like the weight; the 1-D
        # per-out-channel scale s shards along the same (row) axis.
        return P("tp") if ndim == 1 else P("tp", None)
    if "linear2" in keys or "out_proj" in keys:
        # Column-parallel: the out axis is unsharded, so a 1-D scale replicates.
        return P() if ndim == 1 else P(None, "tp")
    return P()


def shard_params(mesh: Mesh, params: dict) -> dict:
    """Place params on the mesh with tp rules (replicated over dp)."""
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _param_spec_for_path(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


def state_sharding_spec(batch_size: int, dp: int = 1, tp: int = 1):
    """Spec callable: shard dim 0 over dp for every per-stream leaf; 4-D
    leaves are the KV caches — slot-major [B, slots, H, d] for BOTH
    attention flavors (ops/attention.py) — whose head axis (dim 2) shards
    over tp to match the head-parallel attention weights.

    Axes that do not divide evenly (e.g. a B=1 voice row on a dp>1 mesh, or
    a head count not divisible by tp) fall back to replication — XLA would
    otherwise reject the placement outright."""
    def spec(leaf) -> P:
        if not (hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == batch_size):
            return P()
        dp_ax = "dp" if batch_size % max(dp, 1) == 0 else None
        if leaf.ndim == 4:
            tp_ax = "tp" if leaf.shape[2] % max(tp, 1) == 0 else None
            return P(dp_ax, None, tp_ax, None)
        return P(dp_ax, *([None] * (leaf.ndim - 1)))

    return spec


def shard_batch_tree(mesh: Mesh, tree, batch_size: int):
    """Place a state/carry/input pytree with the batch dim sharded over dp."""
    spec = state_sharding_spec(
        batch_size, dp=mesh.shape.get("dp", 1), tp=mesh.shape.get("tp", 1)
    )

    def place(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, spec(leaf)))

    return jax.tree_util.tree_map(place, tree)

"""Torch mirror of the parity-critical math, used as the golden reference.

The published checkpoints come from a PyTorch training stack; these mirrors
implement the same operations with torch primitives (independent of the JAX
code under test), so agreement demonstrates the JAX implementation computes
the checkpoint's semantics. Reference behaviors mirrored from
pocket_tts_mlx/modules/{mlp,rope,attention,conv}.py.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def rms_norm_ddof1(x: np.ndarray, alpha: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    xt = torch.tensor(x)
    var = eps + torch.var(xt, dim=-1, keepdim=True, unbiased=True)
    return (xt * (torch.tensor(alpha) * torch.rsqrt(var))).numpy()


def layer_norm(x, weight=None, bias=None, eps=1e-5):
    xt = torch.tensor(x)
    mean = xt.mean(dim=-1, keepdim=True)
    var = xt.var(dim=-1, keepdim=True, unbiased=False)
    y = (xt - mean) / torch.sqrt(var + eps)
    if weight is not None:
        y = y * torch.tensor(weight) + torch.tensor(bias)
    return y.numpy()


def apply_rope(q: np.ndarray, k: np.ndarray, offset, max_period=10000.0):
    """Interleaved-pair RoPE on [B, T, H, D] with scalar or [B] offset."""
    B, T, H, D = q.shape
    ds = np.arange(D // 2, dtype=np.float32)
    freqs = np.exp(ds * (-math.log(max_period) * 2 / D))
    ts = np.arange(T, dtype=np.float32)[None, :] + np.asarray(offset, np.float32).reshape(-1, 1)
    angles = ts[:, :, None] * freqs[None, None, :]  # [B, T, D/2]
    cos = np.cos(angles)[:, :, None, :]
    sin = np.sin(angles)[:, :, None, :]

    def rot(x):
        xs = x.reshape(B, T, H, D // 2, 2)
        xr, xi = xs[..., 0], xs[..., 1]
        return np.stack([xr * cos - xi * sin, xr * sin + xi * cos], axis=-1).reshape(B, T, H, D)

    return rot(q.astype(np.float32)), rot(k.astype(np.float32))


def causal_attention(x, w_in, w_out, num_heads, max_period=10000.0):
    """Full-sequence causal attention with RoPE, reference packing/masking."""
    B, T, E = x.shape
    d = E // num_heads
    projected = x @ w_in.T
    packed = projected.reshape(B, T, 3, num_heads, d)
    q, k, v = packed[:, :, 0], packed[:, :, 1], packed[:, :, 2]
    q, k = apply_rope(q, k, 0.0, max_period)
    q = np.transpose(q, (0, 2, 1, 3))
    k = np.transpose(k, (0, 2, 1, 3))
    v = np.transpose(v, (0, 2, 1, 3))
    scores = q @ np.transpose(k, (0, 1, 3, 2)) / math.sqrt(d)
    mask = np.tril(np.ones((T, T), dtype=bool))
    scores = np.where(mask[None, None], scores, -1e9)
    weights = torch.softmax(torch.tensor(scores), dim=-1).numpy()
    out = (weights @ v).transpose(0, 2, 1, 3).reshape(B, T, E)
    return out @ w_out.T


def windowed_attention(x, w_in, w_out, num_heads, context, max_period=10000.0):
    """Full-sequence sliding-window causal attention with RoPE."""
    B, T, E = x.shape
    d = E // num_heads
    projected = x @ w_in.T
    packed = projected.reshape(B, T, 3, num_heads, d)
    q, k, v = packed[:, :, 0], packed[:, :, 1], packed[:, :, 2]
    q, k = apply_rope(q, k, 0.0, max_period)
    q = np.transpose(q, (0, 2, 1, 3))
    k = np.transpose(k, (0, 2, 1, 3))
    v = np.transpose(v, (0, 2, 1, 3))
    scores = q @ np.transpose(k, (0, 1, 3, 2)) / math.sqrt(d)
    idx = np.arange(T)
    delta = idx[:, None] - idx[None, :]
    mask = (delta >= 0) & (delta < context)
    scores = np.where(mask[None, None], scores, -1e9)
    weights = torch.softmax(torch.tensor(scores), dim=-1).numpy()
    out = (weights @ v).transpose(0, 2, 1, 3).reshape(B, T, E)
    return out @ w_out.T


def causal_conv1d(x, weight, bias, stride=1, dilation=1, groups=1, pad_mode="constant"):
    """Reference streaming-conv semantics on a full sequence: left-pad by
    (effective_kernel - stride) with zeros or edge replication."""
    k_eff = (weight.shape[-1] - 1) * dilation + 1
    overlap = k_eff - stride
    xt = torch.tensor(x)
    if overlap > 0:
        mode = "replicate" if pad_mode == "replicate" else "constant"
        xt = F.pad(xt, (overlap, 0), mode=mode)
    y = F.conv1d(
        xt,
        torch.tensor(weight),
        torch.tensor(bias) if bias is not None else None,
        stride=stride,
        dilation=dilation,
        groups=groups,
    )
    return y.numpy()


def streaming_conv_transpose1d_full(x, weight_torch, bias, stride, groups=1):
    """Reference streaming convtr over a full sequence: emit T*stride samples."""
    y = F.conv_transpose1d(
        torch.tensor(x),
        torch.tensor(weight_torch),
        torch.tensor(bias) if bias is not None else None,
        stride=stride,
        groups=groups,
    ).numpy()
    overlap = weight_torch.shape[-1] - stride
    return y[..., : y.shape[-1] - overlap] if overlap > 0 else y


def timestep_embedder(t, w0, b0, w2, b2, alpha, freq_size=256, max_period=10000):
    half = freq_size // 2
    freqs = np.exp(-math.log(max_period) * np.arange(half, dtype=np.float32) / half)
    args = t * freqs[None, :]
    emb = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    h = emb @ w0.T + b0
    h = torch.nn.functional.silu(torch.tensor(h)).numpy()
    h = h @ w2.T + b2
    return rms_norm_ddof1(h, alpha, eps=1e-5)


def adaln_mlp(params_np, c, s, t, x):
    """Mirror of SimpleMLPAdaLN given numpy params in our pytree layout."""
    silu = lambda a: torch.nn.functional.silu(torch.tensor(a)).numpy()

    x = x @ params_np["input_proj"]["weight"].T + params_np["input_proj"]["bias"]
    embs = []
    for i, tv in enumerate((s, t)):
        te = params_np["time_embed"][i]["mlp"]
        embs.append(
            timestep_embedder(
                tv, te[0]["weight"], te[0]["bias"], te[2]["weight"], te[2]["bias"], te[3]["alpha"]
            )
        )
    t_combined = sum(embs) / len(embs)
    c = c @ params_np["cond_embed"]["weight"].T + params_np["cond_embed"]["bias"]
    y = t_combined + c

    for blk in params_np["res_blocks"]:
        ada = silu(y) @ blk["adaLN_modulation"][1]["weight"].T + blk["adaLN_modulation"][1]["bias"]
        shift, scale, gate = np.split(ada, 3, axis=-1)
        normed = layer_norm(x, blk["in_ln"]["weight"], blk["in_ln"]["bias"], eps=1e-6)
        h = normed * (1 + scale) + shift
        h = h @ blk["mlp"][0]["weight"].T + blk["mlp"][0]["bias"]
        h = silu(h)
        h = h @ blk["mlp"][2]["weight"].T + blk["mlp"][2]["bias"]
        x = x + gate * h

    fl = params_np["final_layer"]
    ada = silu(y) @ fl["adaLN_modulation"][1]["weight"].T + fl["adaLN_modulation"][1]["bias"]
    shift, scale = np.split(ada, 2, axis=-1)
    h = layer_norm(x, eps=1e-6) * (1 + scale) + shift
    return h @ fl["linear"]["weight"].T + fl["linear"]["bias"]

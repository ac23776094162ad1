"""FlowLM: the autoregressive latent language model.

Mirrors the reference semantics (reference: pocket_tts_mlx/models/flow_lm.py:31-142)
with a TPU-native decomposition into two jittable pure functions:

  - prefill():     run the backbone over conditioning embeddings (text tokens
                   and/or speaker audio embeddings) to fill the KV cache.
                   The reference routes this through the same sampling call
                   and discards the sample (tts_model.py:389, :512); here
                   prefill skips the flow head entirely.
  - decode_step(): one autoregressive step: embed the previous latent (or the
                   BOS embedding — the reference signals BOS with NaN
                   sentinels, flow_lm.py:93; here it is an explicit bool
                   mask), run the backbone on a single position, read the EOS
                   logit, then integrate the flow-matching ODE from fresh
                   noise to sample the next 32-d latent.

State is {transformer KV caches, pos[B]} — positions are per-stream int32 so
heterogeneous batches decode in lockstep.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config.schema import FlowLMConfig
from pocket_tts_tpu.ops.adaln import SimpleMLPAdaLN
from pocket_tts_tpu.ops.linear import embedding, linear
from pocket_tts_tpu.ops.norms import layer_norm
from pocket_tts_tpu.ops.sampling import lsd_decode, sample_noise
from pocket_tts_tpu.ops.transformer import StreamingTransformer

Params = dict
State = dict


@dataclass(frozen=True)
class FlowLMModel:
    """Static description of FlowLM; params/state are explicit pytrees."""

    config: FlowLMConfig
    latent_dim: int
    # Width of the Mimi encoder output consumed by the speaker projection
    # (512 for the shipped checkpoint; reference hard-codes the shape at
    # pocket_tts_mlx/models/tts_model.py:103).
    speaker_dim: int = 512

    @property
    def dim(self) -> int:
        return self.config.transformer.d_model

    @property
    def ldim(self) -> int:
        return self.latent_dim

    @property
    def n_bins(self) -> int:
        return self.config.lookup_table.n_bins

    @property
    def transformer(self) -> StreamingTransformer:
        t = self.config.transformer
        return StreamingTransformer(
            d_model=t.d_model,
            num_heads=t.num_heads,
            num_layers=t.num_layers,
            dim_feedforward=int(t.d_model * t.hidden_scale),
            max_period=float(t.max_period),
            kind="flow_lm",
        )

    @property
    def flow_net(self) -> SimpleMLPAdaLN:
        return SimpleMLPAdaLN(
            in_channels=self.latent_dim,
            model_channels=self.config.flow.dim,
            out_channels=self.latent_dim,
            cond_channels=self.dim,
            num_res_blocks=self.config.flow.depth,
            num_time_conds=2,
        )

    # ------------------------------------------------------------------ params

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, 6)
        dim, ldim = self.dim, self.ldim
        s_in = 1.0 / (ldim ** 0.5)
        s_eos = 1.0 / (dim ** 0.5)
        return {
            "conditioner": {
                "embed": {
                    "weight": jax.random.normal(keys[0], (self.n_bins + 1, dim), dtype=dtype)
                    * 0.02
                }
            },
            "flow_net": self.flow_net.init_params(keys[1], dtype),
            "transformer": self.transformer.init_params(keys[2], dtype),
            "input_linear": {
                "weight": jax.random.uniform(
                    keys[3], (dim, ldim), minval=-s_in, maxval=s_in, dtype=dtype
                )
            },
            "out_norm": {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)},
            "out_eos": {
                "weight": jax.random.uniform(
                    keys[4], (1, dim), minval=-s_eos, maxval=s_eos, dtype=dtype
                ),
                "bias": jnp.zeros((1,), dtype),
            },
            "bos_emb": jax.random.normal(keys[5], (ldim,), dtype=dtype),
            "emb_std": jnp.ones((ldim,), dtype=dtype),
            "emb_mean": jnp.zeros((ldim,), dtype=dtype),
            "speaker_proj_weight": jnp.zeros((dim, self.speaker_dim), dtype=dtype),
        }

    def init_state(self, batch_size: int, capacity: int, dtype=jnp.float32) -> State:
        return {
            "transformer": self.transformer.init_state(batch_size, capacity, dtype),
            "pos": jnp.zeros((batch_size,), dtype=jnp.int32),
        }

    # ------------------------------------------------------------------ embed

    def embed_text(self, params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
        """Token ids [B, T] -> conditioning embeddings [B, T, d_model]."""
        return embedding(tokens, params["conditioner"]["embed"]["weight"])

    def project_speaker(self, params: Params, latents: jnp.ndarray) -> jnp.ndarray:
        """Mimi encoder latents [B, T, 512] -> conditioning [B, T, d_model]
        (reference: pocket_tts_mlx/models/tts_model.py:271-276)."""
        return jnp.matmul(
            latents.astype(jnp.float32), params["speaker_proj_weight"].T.astype(jnp.float32)
        )

    # ------------------------------------------------------------------ apply

    def prefill(
        self,
        params: Params,
        state: State,
        embeddings: jnp.ndarray,  # [B, T, d_model], right-padded per stream
        lengths: jnp.ndarray,  # int32 [B]: valid length per stream
    ) -> State:
        """Fill the KV cache with conditioning embeddings.

        Padded positions are marked -1 and land in cache slots that are never
        valid, so right-padded heterogeneous batches need no scatter or
        cleanup (see ops/attention.CausalKVAttention).
        """
        B, T, _ = embeddings.shape
        offsets = jnp.arange(T, dtype=jnp.int32)[None, :]
        positions = jnp.where(
            offsets < lengths[:, None], state["pos"][:, None] + offsets, -1
        )
        out, transformer_state = self.transformer(
            params["transformer"], embeddings, state["transformer"], positions
        )
        del out
        return {"transformer": transformer_state, "pos": state["pos"] + lengths}

    def decode_step(
        self,
        params: Params,
        state: State,
        latent: jnp.ndarray,  # [B, ldim] previous latent (ignored where is_bos)
        is_bos: jnp.ndarray,  # bool [B]
        rng: jax.Array,
        temp: jnp.ndarray | float,
        lsd_decode_steps: int,
        noise_clamp: Optional[float],
        eos_threshold: jnp.ndarray | float,
        noise: Optional[jnp.ndarray] = None,
        read_limit: Optional[int] = None,
        batch_kernel: bool = False,
    ) -> tuple[State, jnp.ndarray, jnp.ndarray]:
        """One autoregressive step -> (state, next_latent [B, ldim], is_eos [B]).

        `noise` optionally supplies the pre-drawn flow-ODE starting noise
        [B, ldim] (the fused segment vectorizes the threefry draws for all S
        frames of a segment in ONE op before its scan — bitwise identical to
        drawing from `rng` here, but off the serial per-frame path).

        `read_limit` (static) bounds the KV rows attention reads — the
        batch decode is cache-read bound, and the host knows how many front
        rows are live at dispatch time (ops/attention.CausalKVAttention)."""
        B = latent.shape[0]
        if self._fused_step_ok(params, state, B):
            state, h, eos_logits = self._fused_step(params, state, latent, is_bos)
            is_eos = eos_logits > eos_threshold
            return self._flow_sample(
                params, state, h, rng, temp, lsd_decode_steps, noise_clamp,
                is_eos, noise, B,
            )
        seq = jnp.where(is_bos[:, None], params["bos_emb"][None, :].astype(latent.dtype), latent)
        x = linear(seq[:, None, :], params["input_linear"]["weight"])  # [B, 1, dim]

        h, transformer_state = self.transformer(
            params["transformer"], x, state["transformer"], state["pos"][:, None],
            read_limit=read_limit, batch_kernel=batch_kernel,
        )
        h = layer_norm(
            h, params["out_norm"]["weight"], params["out_norm"]["bias"], eps=1e-5
        ).astype(jnp.float32)
        h = h[:, -1]  # [B, dim]

        eos_logits = linear(h, params["out_eos"]["weight"], params["out_eos"]["bias"])[:, 0]
        is_eos = eos_logits > eos_threshold

        new_state = {"transformer": transformer_state, "pos": state["pos"] + 1}
        return self._flow_sample(
            params, new_state, h, rng, temp, lsd_decode_steps, noise_clamp,
            is_eos, noise, B,
        )

    def _flow_sample(
        self, params, new_state, h, rng, temp, lsd_decode_steps, noise_clamp,
        is_eos, noise, B,
    ):
        """Integrate the flow-matching ODE from noise, conditioned on h."""
        if noise is None:
            noise = sample_noise(rng, (B, self.ldim), temp, noise_clamp)
        flow = self.flow_net

        def v_t(s, t, x_cur):
            return flow(params["flow_net"], h, s, t, x_cur)

        next_latent = lsd_decode(v_t, noise, lsd_decode_steps)
        return new_state, next_latent, is_eos

    def _fused_step_ok(self, params: Params, state: State, B: int) -> bool:
        """Static dispatch test for the head-folded megakernel
        (ops/fused_backbone.fused_backbone_step): B == 1 decode with packed
        int8 weights + head constants present (load_model packs them on TPU
        only) and a capacity bucket within the kernel's VMEM budget."""
        from pocket_tts_tpu.ops.fused_backbone import fused_head_enabled

        t = params["transformer"]
        return (
            B == 1
            and isinstance(t, dict)
            and "fused" in t
            and "fused_head" in t
            and fused_head_enabled()
            # The megakernel DMAs bf16 cache rows; the int8-KV cache (batch
            # serving mode) routes through the XLA path instead.
            and state["transformer"]["layers"][0]["k"].dtype != jnp.int8
            and StreamingTransformer._fused_capacity_ok(state["transformer"], kind="head")
        )

    def _fused_step(
        self, params: Params, state: State, latent: jnp.ndarray, is_bos: jnp.ndarray
    ) -> tuple[State, jnp.ndarray, jnp.ndarray]:
        """B=1 backbone step through the head-folded megakernel ->
        (new state, h [1, dim] f32 post-out-norm, eos_logit [1] f32).

        The kernel appends this frame's (k, v) and slot position in place
        (aliased outputs) and runs the input projection / out_norm / EOS
        logit on already-resident VMEM data; all six layers share ONE
        updated slot_pos array (their rows are always written in lockstep)."""
        from pocket_tts_tpu.ops.fused_backbone import (
            fused_backbone_step,
            fused_int8_act_enabled,
            fused_interpret_enabled,
            select_modes,
        )
        from pocket_tts_tpu.ops.rope import rope_angles

        t_params = params["transformer"]
        tstate = state["transformer"]
        layers = tstate["layers"]
        widx = tstate["widx"]
        positions = state["pos"][:, None]  # [1, 1]
        tcfg = self.config.transformer
        cos, sin = rope_angles(
            jnp.maximum(positions, 0),
            tcfg.d_model // tcfg.num_heads,
            float(tcfg.max_period),
        )
        k0 = layers[0]["k"]  # [1, C, H, d] slot-major
        kv_bytes = 2 * k0.shape[1] * k0.shape[2] * k0.shape[3] * k0.dtype.itemsize
        attn_mode, block = select_modes(kv_bytes, k0.shape[1], head=True)
        h, eos_logit, new_ks, new_vs, spnew = fused_backbone_step(
            t_params["fused"],
            t_params["fused_head"],
            latent,
            is_bos,
            tuple(l["k"] for l in layers),
            tuple(l["v"] for l in layers),
            layers[0]["slot_pos"],
            positions[:, 0],
            cos[0, 0, 0],
            sin[0, 0, 0],
            jnp.reshape(widx, (1,)).astype(jnp.int32),
            num_heads=tcfg.num_heads,
            interpret=fused_interpret_enabled(),
            int8_act=fused_int8_act_enabled(),
            attn_mode=attn_mode,
            block=block,
        )
        new_layers = [
            {"k": new_ks[i][None], "v": new_vs[i][None], "slot_pos": spnew}
            for i in range(len(layers))
        ]
        new_state = {
            "transformer": {"layers": new_layers, "widx": widx + 1},
            "pos": state["pos"] + 1,
        }
        return new_state, h, eos_logit

    # ------------------------------------------------------------------ state utils

    def expand_state(self, state: State, capacity: int) -> State:
        """Grow KV capacity to at least `capacity` (functional analogue of the
        reference's in-place cache expansion, tts_model.py:278-295). k/v pad
        with zeros; slot_pos pads with -1 (invalid)."""
        def grow_layer(layer: State) -> State:
            cur = layer["k"].shape[1]  # slot-major [B, C, H, d]
            if cur >= capacity:
                return layer
            pad = capacity - cur

            def grow(name, leaf):
                # Every leaf is [B, C, ...] (k/v rows, slot_pos, int8-KV
                # scales); new slots pad with -1 (invalid) for slot_pos and
                # zeros otherwise.
                widths = ((0, 0), (0, pad)) + ((0, 0),) * (leaf.ndim - 2)
                fill = -1 if name == "slot_pos" else 0
                return jnp.pad(leaf, widths, constant_values=fill)

            return {name: grow(name, leaf) for name, leaf in layer.items()}

        layers = [grow_layer(l) for l in state["transformer"]["layers"]]
        transformer = {"layers": layers, "widx": state["transformer"]["widx"]}
        return {"transformer": transformer, "pos": state["pos"]}

    def compact_state(self, state: State, new_written: int) -> State:
        """Gather each stream's valid cache entries to the front of its row.

        The slot-indexed cache writes at a batch-common index that only grows
        (every call consumes t_pad + dispatched slots even where a stream's
        positions were padding/overshoot). Compaction reclaims those dead
        slots — one gather per layer, amortized over ~capacity frames — so
        long continuation sessions stay within one capacity bucket instead of
        growing (and recompiling) forever. `new_written` must upper-bound
        max(valid positions) + 1."""

        def compact_layer(layer: State) -> State:
            slot_pos = layer["slot_pos"]  # [B, cap]
            order = jnp.argsort(
                jnp.where(slot_pos >= 0, slot_pos, 2**30), axis=1
            )  # valid entries first, in position order
            gathered_pos = jnp.take_along_axis(slot_pos, order, axis=1)

            def g(a):
                # Whole-row gather on the [cap, H*d]-flattened cache: XLA
                # lowers a[order] to one gather of contiguous 2 KiB rows.
                # (Broadcasting the index to the full [B, cap, H, d] shape
                # instead lowers to a PER-ELEMENT gather — measured ~290 ms
                # per layer leaf at [16, 1024, 16, 64] on v5e, ~3 s per
                # engine park group, vs sub-ms for the row form.)
                B, cap = a.shape[0], a.shape[1]
                flat = a.reshape(B, cap, -1)
                return jax.vmap(lambda row, o: row[o])(flat, order).reshape(a.shape)

            out = {
                name: (gathered_pos if name == "slot_pos" else g(leaf))
                for name, leaf in layer.items()
            }
            return out

        layers = [compact_layer(l) for l in state["transformer"]["layers"]]
        return {
            "transformer": {"layers": layers, "widx": jnp.asarray(new_written, jnp.int32)},
            "pos": state["pos"],
        }

    def state_capacity(self, state: State) -> int:
        return state["transformer"]["layers"][0]["k"].shape[1]  # [B, C, H, d]

    def state_written(self, state: State) -> "jnp.ndarray":
        """Device-side write index (slots consumed so far)."""
        return state["transformer"]["widx"]

    def invalidate_after(self, state: State, pos_target: jnp.ndarray) -> State:
        """Mark cache slots at positions >= pos_target[b] invalid — used to
        rewind streams past frames computed after their EOS break point."""
        def fix(layer: State) -> State:
            slot_pos = jnp.where(layer["slot_pos"] >= pos_target[:, None], -1, layer["slot_pos"])
            return {**layer, "slot_pos": slot_pos}

        layers = [fix(l) for l in state["transformer"]["layers"]]
        transformer = {"layers": layers, "widx": state["transformer"]["widx"]}
        return {"transformer": transformer, "pos": jnp.asarray(pos_target, jnp.int32)}

"""End-to-end TTS pipeline: conditioning -> FlowLM decode loop -> Mimi vocoder.

Public API mirrors the reference `TTSModel`
(reference: pocket_tts_mlx/models/tts_model.py:54-518): `load_model`,
`get_state_for_audio_prompt`, `generate_audio`, `generate_audio_stream`, the
same defaults and the same text normalization/chunking rules.

TPU-native execution model (differs deliberately from the reference's
per-frame Python loop with a device sync every frame, tts_model.py:402-428):

  - The whole generate step — FlowLM transformer step, EOS test, noise
    sampling, flow-matching ODE, Mimi frame decode — is ONE jitted function.
  - Frames are generated in `lax.scan` segments; EOS bookkeeping (eos_step,
    frames_after_eos tail, per-stream max_gen_len) lives on-device in the
    scan carry, and the host syncs once per segment to pull audio and check
    completion, not once per frame.
  - All state (KV caches, conv overlaps, ring buffers, positions) is an
    explicit pytree with static shapes; KV capacity is bucketed so repeated
    calls hit the jit cache.
  - Everything is batch-first: `generate_audio_batch` decodes B concurrent
    streams with per-stream positions, EOS and lengths (the reference is
    hard-coded to batch 1, tts_model.py:383).
"""

from __future__ import annotations

import functools
import logging
import os

import time
from pathlib import Path
from typing import Dict, Generator, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.config.schema import Config, builtin_config_path, load_config
from pocket_tts_tpu.data.audio import audio_read
from pocket_tts_tpu.data.audio_utils import convert_audio
from pocket_tts_tpu.default_parameters import (
    DEFAULT_EOS_THRESHOLD,
    DEFAULT_LSD_DECODE_STEPS,
    DEFAULT_NOISE_CLAMP,
    DEFAULT_SEGMENT_FRAMES,
    DEFAULT_TEMPERATURE,
    DEFAULT_VARIANT,
    KV_CAPACITY_BUCKET,
    MAX_TOKEN_PER_CHUNK,
)
from pocket_tts_tpu.models.flow_lm import FlowLMModel
from pocket_tts_tpu.models.generate import decode_mimi_frame, initial_carry, make_segment_fn
from pocket_tts_tpu.models.mimi import MimiModel
from pocket_tts_tpu.models.text import (
    estimate_max_gen_len,
    make_tokenizer,
    prepare_text_prompt,
    split_into_best_sentences,
)
from pocket_tts_tpu.models.weights import cast_serving_dtype, load_state_dict
from pocket_tts_tpu.utils.assets import download_if_necessary
from pocket_tts_tpu.utils.env import env_flag
from pocket_tts_tpu.utils.safetensors import load_safetensors
from pocket_tts_tpu.utils.timing import display_execution_time, size_of_pytree

logger = logging.getLogger(__name__)

# Uniform segment size for non-streaming (bulk) generation: one compiled
# program regardless of utterance length; overshoot frames are masked and the
# stream positions rewound afterwards.
_BULK_SEGMENT_FRAMES = 64


def _stream_steady(segment_frames: int) -> int:
    """Steady-state streaming segment size: 32 frames regardless of the
    (smaller) engine-style default segment size — dispatch granularity, not
    yield granularity; a larger segment_frames raises the cap (bounded at
    64, the bulk segment size). Shared with the Mimi decode-ring sizing so
    the vocoder ring always covers the largest streamed chunk."""
    return min(64, max(32, 1 << (max(1, segment_frames) - 1).bit_length()))


def _stream_schedule(max_gen_all: int, segment_frames: int) -> list[int]:
    """Streaming segment schedule: 1, 2, 4, ... doubling to a 32-frame steady
    state, tail bucketed to a power of 2.

    Tiny first segments keep time-to-first-audio low; each dispatched segment
    then costs ~2 ms of fixed host/relay overhead regardless of size, so
    doubling converges the streaming wall clock toward bulk's. Frames still
    YIELD one at a time — only dispatch granularity grows. Tail overshoot is
    emit-masked and the stream positions rewind afterwards, so compiled
    shapes stay bounded to {1, 2, 4, 8, 16, 32}.
    """
    steady = _stream_steady(segment_frames)
    sched, total, s = [], 0, 1
    while total < max_gen_all:
        rem = max_gen_all - total
        if s > rem:
            s = 1 << (rem - 1).bit_length()  # bucketed tail
        sched.append(s)
        total += s
        s = min(s * 2, steady)
    return sched


def _bulk_schedule(max_gen_all: int) -> list[int]:
    """Bulk-mode segment schedule: as many 64-frame segments as fit, then one
    power-of-2 tail bucket covering the remainder.

    Per-segment fixed cost (dispatch, donation plumbing, fetch bookkeeping)
    measured ~2 ms through the relay, so big segments win (0.44 -> 0.375
    ms/frame going 32 -> 64, benchmarks/ablate.py); the bucketed tail keeps
    the overshoot (masked, but computed) small for arbitrary utterance
    lengths while bounding the set of compiled shapes to {8, 16, 32, 64}.
    """
    n_big, rem = divmod(max(0, max_gen_all), _BULK_SEGMENT_FRAMES)
    sched = [_BULK_SEGMENT_FRAMES] * n_big
    if rem:
        sched.append(min(_BULK_SEGMENT_FRAMES, max(8, 1 << (rem - 1).bit_length())))
    return sched


@jax.jit
def _split2(key: jax.Array) -> tuple[jax.Array, jax.Array]:
    k1, k2 = jax.random.split(key)
    return k1, k2


@functools.lru_cache(maxsize=1)
def _cpu_device():
    return jax.local_devices(backend="cpu")[0]


def _split_key_cpu(key: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split a PRNG key on the host CPU backend (jit follows the committed
    input placement). Keeps the per-utterance/per-tick key chain off the
    accelerator dispatch path — an eager split there costs a full round-trip
    for an 8-byte computation."""
    return _split2(jax.device_put(key, _cpu_device()))


def enable_compilation_cache(path: str = "~/.cache/pocket_tts/jax_cache") -> None:
    """Persist compiled executables across processes (first jit of the fused
    decode graph can take minutes on remote-compile backends)."""
    try:
        cache_dir = os.path.expanduser(path)
        os.makedirs(cache_dir, exist_ok=True)  # may fail: read-only HOME
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # noqa: BLE001 — unwritable cache dir/older jax
        logger.debug("compilation cache unavailable: %s", exc)

# Predefined voice embeddings (speaker-conditioning prefill tensors), same
# assets as the reference (reference: pocket_tts_mlx/utils/weight_conversion.py:31-35).
_VOICE_NAMES = ["alba", "marius", "javert", "jean", "fantine", "cosette", "eponine", "azelma"]
PREDEFINED_VOICES = {
    name: (
        "hf://kyutai/pocket-tts-without-voice-cloning/embeddings/"
        f"{name}.safetensors@d4fdd22ae8c8e1cb3634e150ebeff1dab2d16df3"
    )
    for name in _VOICE_NAMES
}

VOICE_CLONING_UNSUPPORTED = (
    "We could not download the weights for the model with voice cloning, "
    "but you're trying to use voice cloning. "
    f"Without voice cloning, you can use our catalog of voices {list(PREDEFINED_VOICES)}. "
    "If you want access to the model with voice cloning, go to "
    "https://huggingface.co/kyutai/pocket-tts and accept the terms, "
    "then make sure you're logged in locally with `hf auth login`."
)


def _bucket(n: int, bucket: int = KV_CAPACITY_BUCKET) -> int:
    return max(bucket, ((n + bucket - 1) // bucket) * bucket)


class ModelState:
    """Handle around the FlowLM voice/continuation state.

    The underlying pytree is immutable (functional updates), so 'deep copy'
    semantics of the reference (tts_model.py:372-373) are free: passing the
    same ModelState to many generations with copy_state=True reuses the same
    device buffers. `pos` mirrors the device-side stream positions on the
    host so orchestration never needs a device sync to size caches.
    """

    def __init__(self, tree: Dict, pos: list[int], written: int | None = None):
        self.tree = tree
        self.pos = list(pos)
        # Host mirror of the cache write index (slots consumed; batch-common).
        self.written = int(written) if written is not None else max(self.pos, default=0)

    @property
    def batch_size(self) -> int:
        return len(self.pos)

    def size_bytes(self) -> int:
        return size_of_pytree(self.tree)


# Capacity buckets probed at load: the serving defaults (the engine's
# standard bucket and the long-utterance growth bucket). Other capacities
# are probed on demand at the expansion/growth sites
# (TTSModel.ensure_buckets_probed) — growth already recompiles there, so the
# probe adds no extra stall window.
DEFAULT_PROBE_BUCKETS = (512, 1024)


def _probe_fused_compile(model, capacities=None) -> None:
    """Compile-probe the packed Pallas kernels PER CAPACITY BUCKET at load
    time, degrading stepwise per bucket instead of crashing a live request
    (VERDICT r3 item 4 — the old probe hardcoded C=512, so a Mosaic
    rejection specific to another bucket surfaced mid-serving on the first
    long-utterance request).

    For each bucket x kind (body megakernel, head-folded kernel, segment
    kernel) the probe walks the static block-preference chain
    (block_candidates / segment_block_candidates) and records the first
    block that actually compiles (fused_backbone.record_bucket_mode) — the
    dispatch gates and select_modes consult those verdicts, so a bucket
    whose preferred layout overflows scoped VMEM demotes to a smaller block
    (or to the next-simpler kernel) AT LOAD, with a warning. Only when a
    kernel compiles at NO probed bucket are its packed layouts dropped
    entirely. With the persistent compile cache the probe is one-time work
    the first real request at that bucket would have paid anyway.
    POCKET_TTS_NO_FUSED_PROBE=1 skips it."""
    if env_flag("POCKET_TTS_NO_FUSED_PROBE", False):
        return
    from pocket_tts_tpu.ops.fused_backbone import (
        block_candidates,
        bucket_probed,
        fused_attn_mode,
        fused_backbone_decode,
        fused_backbone_step,
        record_bucket_mode,
    )
    from pocket_tts_tpu.ops.fused_segment import (
        fused_segment_decode,
        fused_segment_enabled,
        segment_block_candidates,
    )

    t = model.params["flow_lm"]["transformer"]
    if "fused" not in t:
        return
    fl = model.flow_lm
    tcfg = fl.config.transformer
    E, H, L = tcfg.d_model, tcfg.num_heads, tcfg.num_layers
    d = E // H
    attn = fused_attn_mode()
    sds = jax.ShapeDtypeStruct
    if capacities is None:
        capacities = DEFAULT_PROBE_BUCKETS
    todo = [int(C) for C in capacities if not bucket_probed("body", int(C))]
    if not todo:
        return

    def walk(kind, C, candidates, lower_one):
        """Try candidate blocks in order; record and return the first that
        compiles (None if all are rejected)."""
        last_err = None
        for blk in candidates:
            try:
                lower_one(blk).compile()
            except Exception as e:  # noqa: BLE001 — any rejection demotes
                last_err = e
                continue
            record_bucket_mode(kind, C, blk)
            if blk != candidates[0]:
                logger.warning(
                    "C=%d: %s kernel demoted %s -> %s (preferred layout "
                    "rejected: %s)", C, kind, candidates[0], blk,
                    str(last_err).splitlines()[0][:160],
                )
            return blk
        record_bucket_mode(kind, C, None)
        logger.warning(
            "C=%d: %s kernel disabled for this bucket (no block layout "
            "compiled: %s)", C, kind,
            str(last_err).splitlines()[0][:160] if last_err else "?",
        )
        return None

    probe_segment = "fused_segment" in t and fused_segment_enabled()
    for C in todo:
        kv = tuple(sds((1, C, H, d), model.state_dtype) for _ in range(L))
        sp = sds((1, C), jnp.int32)
        i32 = sds((1,), jnp.int32)
        cs = sds((d // 2,), jnp.float32)
        kvb = 2 * H * C * d * jnp.dtype(model.state_dtype).itemsize

        body = walk(
            "body", C, block_candidates(kvb),
            lambda blk: fused_backbone_decode.lower(
                t["fused"], sds((1, E), jnp.float32), kv, kv, sp, i32, cs, cs,
                widx=i32, num_heads=H, attn_mode=attn, block=blk,
            ),
        )
        if body is None:
            # The head/segment kernels embed the body program: no point
            # probing them at a bucket whose body already failed.
            record_bucket_mode("head", C, None)
            record_bucket_mode("segment", C, None)
            continue
        head = walk(
            "head", C, block_candidates(kvb, head=True),
            lambda blk: fused_backbone_step.lower(
                t["fused"], t["fused_head"], sds((1, fl.ldim), jnp.float32),
                sds((1,), jnp.bool_), kv, kv, sp, i32, cs, cs, i32,
                num_heads=H, attn_mode=attn, block=blk,
            ),
        )
        if head is None or not probe_segment:
            record_bucket_mode("segment", C, None)
            continue
        S = 8  # proxy segment length: the block layouts, scratch, and VMEM
        # budget are S-invariant (S only sizes the tiny latent/noise rows)
        walk(
            "segment", C, segment_block_candidates(kvb),
            lambda blk: fused_segment_decode.lower(
                t["fused"], t["fused_head"], t["fused_segment"],
                sds((1, fl.ldim), jnp.float32), sds((1,), jnp.bool_),
                sds((S, fl.ldim), jnp.float32), kv, kv, sp, i32, i32,
                sds((S, d // 2), jnp.float32), sds((S, d // 2), jnp.float32),
                num_heads=H, seg_frames=S, block=blk,
            ),
        )

    # Global degrade: a kernel that compiles at NO probed bucket is dropped
    # outright (e.g. a backend without Mosaic support at all) — unprobed
    # capacities would otherwise still dispatch it through the static gates.
    from pocket_tts_tpu.ops.fused_backbone import _BUCKET_MODES

    def any_enabled(kind):
        return any(
            blk is not None for (k, _), blk in _BUCKET_MODES.items() if k == kind
        )

    if not any_enabled("body"):
        logger.warning(
            "megakernel failed to compile at every probed bucket; "
            "falling back to the XLA decode path"
        )
        t.pop("fused", None)
        t.pop("fused_head", None)
        t.pop("fused_segment", None)
    elif not any_enabled("head"):
        logger.warning(
            "head-folded kernel failed at every probed bucket; "
            "using the body-only megakernel"
        )
        t.pop("fused_head", None)
        t.pop("fused_segment", None)
    elif probe_segment and not any_enabled("segment"):
        logger.warning(
            "whole-segment kernel failed at every probed bucket; "
            "using the per-frame kernel + scan"
        )
        t.pop("fused_segment", None)


class TTSModel:
    """Text-to-speech pipeline with speaker conditioning, FlowLM, and Mimi."""

    _TOKENS_PER_SECOND_ESTIMATE = 3.0
    _GEN_SECONDS_PADDING = 2.0
    _MIMI_WARMUP_FRAMES = 1

    def ensure_buckets_probed(self, capacities) -> None:
        """Compile-probe the packed Pallas kernels for capacity buckets
        about to enter service (load defaults + any bucket the direct API
        expands to), so a backend rejection demotes that bucket at a
        controlled moment — never inside a live request. No-op for buckets
        already probed or when no packed kernels are present."""
        t = self.params["flow_lm"]["transformer"]
        if isinstance(t, dict) and "fused" in t:
            _probe_fused_compile(self, capacities)

    def __init__(
        self,
        flow_lm: FlowLMModel,
        mimi: MimiModel,
        params: Dict,
        tokenizer,
        temp: float,
        lsd_decode_steps: int,
        noise_clamp: Optional[float],
        eos_threshold: float,
        config: Config,
        seed: int = 0,
        matmul_precision: str = "default",
        transfer_pcm16: bool = False,
        mesh=None,
        kv_int8: Optional[bool] = None,
    ):
        self.flow_lm = flow_lm
        self.mimi = mimi
        self.params = params
        self.tokenizer = tokenizer
        # User-facing conditioner object with the reference's prepare/__call__
        # protocol (reference: pocket_tts_mlx/conditioners/text.py:32-45),
        # bound to the live embedding table. The jitted compute path embeds
        # via flow_lm.embed_text on the same weight.
        from pocket_tts_tpu.conditioners.text import LUTConditioner

        self.conditioner = LUTConditioner(
            n_bins=flow_lm.n_bins,
            tokenizer_path="",
            dim=flow_lm.dim,
            output_dim=flow_lm.dim,
            embed_weight=params["flow_lm"]["conditioner"]["embed"]["weight"],
            tokenizer=tokenizer,
        )
        self.temp = float(temp)
        self.lsd_decode_steps = int(lsd_decode_steps)
        self.noise_clamp = noise_clamp
        self.eos_threshold = float(eos_threshold)
        self.config = config
        self.has_voice_cloning = True
        self.random_init = False  # set when no checkpoint was reachable
        self.matmul_precision = matmul_precision
        # Serving knob: move audio device->host as int16 PCM (half the bytes;
        # identical to what a 16-bit WAV writer would apply). The public API
        # still returns float32 — the host widens after the transfer — so the
        # only difference vs the default is 16-bit amplitude rounding.
        self.transfer_pcm16 = bool(transfer_pcm16)
        self._rng = jax.random.PRNGKey(seed)
        self.state_dtype = jnp.float32  # KV caches / ring buffers
        # int8 FlowLM KV cache (batch-serving mode): rows quantize at append
        # with per-row absmax scales, halving the cache-read bytes of the
        # KV-read-bound batch decode (BENCHMARKS.md batch roofline; measured
        # ~26% off the attention-read chain at B=64, R=512). All FlowLM
        # states this model creates (voice, B=1, batch) carry the int8+scale
        # layout, so engine row-movers splice them uniformly. The B=1 Pallas
        # megakernel has no scale plumbing and falls back to XLA, so leave
        # this OFF for single-stream-optimized models. Default: env
        # POCKET_TTS_KV_INT8.
        if kv_int8 is None:
            kv_int8 = env_flag("POCKET_TTS_KV_INT8", False)
        self.kv_int8 = bool(kv_int8)
        # Multi-chip serving: a jax.sharding.Mesh with ("dp", "tp") axes.
        # Params are tp-sharded (Megatron FF + attention-head TP), per-stream
        # state dp-sharded; None = single-device (parallel/mesh.py).
        self.mesh = mesh
        self._jit_cache: Dict = {}
        self._voice_state_cache: Dict = {}

    # ------------------------------------------------------------------ props

    @property
    def device(self) -> str:
        """Platform name of the backing device (reference exposes a device
        property too; tts_model.py:79-81)."""
        return jax.devices()[0].platform

    @property
    def flow_state_dtype(self):
        """Dtype of the FlowLM KV caches this model creates (int8 rows +
        per-row scales in kv_int8 batch-serving mode; else state_dtype).
        Mimi ring buffers always use state_dtype."""
        return jnp.int8 if self.kv_int8 else self.state_dtype

    @property
    def sample_rate(self) -> int:
        return self.config.mimi.sample_rate

    @property
    def frame_size(self) -> int:
        return self.mimi.frame_size

    # ------------------------------------------------------------------ build

    @classmethod
    def load_model(
        cls,
        config: Union[str, Path] = DEFAULT_VARIANT,
        temp: Union[float, int] = DEFAULT_TEMPERATURE,
        lsd_decode_steps: int = DEFAULT_LSD_DECODE_STEPS,
        noise_clamp: Union[float, int, None] = DEFAULT_NOISE_CLAMP,
        eos_threshold: float = DEFAULT_EOS_THRESHOLD,
        *,
        seed: int = 0,
        param_dtype: str = "float32",
        matmul_precision: str = "default",
        allow_random_init: bool = True,
        transfer_pcm16: bool = False,
        mesh=None,
        dp: int = 1,
        tp: int = 1,
        kv_int8: Optional[bool] = None,
    ) -> "TTSModel":
        """Create a TTSModel and load checkpoint weights.

        Mirrors the reference loader (tts_model.py:202-221) including the
        voice-cloning fallback; additionally, when no checkpoint is reachable
        at all (air-gapped machine) and allow_random_init is True, the model
        starts from random weights with a warning instead of failing.

        Multi-chip serving (TPU-native capability; the reference has no
        distributed code, SURVEY §2.3): pass `mesh=` (a jax.sharding.Mesh
        with ("dp", "tp") axes) or `dp=`/`tp=` factors to build one over the
        visible devices. Params land tp-sharded (Megatron feed-forward +
        attention-head TP), every per-stream state batch-shards over dp, and
        all generate/engine paths run sharded with XLA collectives over ICI
        — no other call-site changes. The B=1 Pallas megakernel is
        single-chip-only and is skipped under a mesh.
        """
        if str(config).endswith(".yaml"):
            cfg = load_config(Path(config))
            logger.info("Loading model from config at %s...", config)
        else:
            cfg = load_config(builtin_config_path(str(config)))

        flow_lm = FlowLMModel(
            config=cfg.flow_lm,
            latent_dim=cfg.mimi.quantizer.dimension,
            speaker_dim=cfg.mimi.seanet.dimension,
        )
        mimi = MimiModel(config=cfg.mimi)

        # "int8" = bf16 serving mode + weight-only int8 quantization of the
        # FlowLM decode hot path (see weights.quantize_int8).
        quantize = param_dtype == "int8"
        serving_dtype = jnp.bfloat16 if quantize else jnp.dtype(param_dtype)
        key = jax.random.PRNGKey(seed)
        k_flow, k_mimi = jax.random.split(key)
        # Always materialize/load in float32; serving dtypes are applied as a
        # final cast with float32 islands (see weights.cast_serving_dtype).
        params = {
            "flow_lm": flow_lm.init_params(k_flow, jnp.float32),
            "mimi": mimi.init_params(k_mimi, jnp.float32),
        }

        tokenizer = make_tokenizer(
            cfg.flow_lm.lookup_table.n_bins, str(cfg.flow_lm.lookup_table.tokenizer_path)
        )

        if mesh is None and (dp > 1 or tp > 1):
            from pocket_tts_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(dp=dp, tp=tp)

        model = cls(
            flow_lm=flow_lm,
            mimi=mimi,
            params=params,
            tokenizer=tokenizer,
            temp=temp,
            lsd_decode_steps=lsd_decode_steps,
            noise_clamp=noise_clamp,
            eos_threshold=eos_threshold,
            config=cfg,
            seed=seed,
            matmul_precision=matmul_precision,
            transfer_pcm16=transfer_pcm16,
            mesh=mesh,
            kv_int8=kv_int8,
        )
        # Persist compiled executables across processes by default: a cold
        # CLI run otherwise pays every jit compile again (minutes on
        # remote-compile backends). POCKET_TTS_NO_COMPILE_CACHE=1 opts out.
        # NOTE: this mutates global jax config (jax_compilation_cache_dir) as
        # a load_model side effect — documented in README serving modes.
        if not env_flag("POCKET_TTS_NO_COMPILE_CACHE", False):
            enable_compilation_cache()
        model._load_weights(cfg, jnp.float32, allow_random_init)
        if serving_dtype != jnp.float32:
            model.params = cast_serving_dtype(model.params, serving_dtype)
            model.state_dtype = serving_dtype
        if quantize:
            from pocket_tts_tpu.models.weights import quantize_int8

            model.params = quantize_int8(model.params)
            from pocket_tts_tpu.ops.fused_backbone import (
                fused_backbone_enabled,
                pack_backbone_head,
                pack_backbone_int8,
            )

            if (
                fused_backbone_enabled()
                and mesh is None  # the megakernel is single-chip B=1 only
                and jax.devices()[0].platform == "tpu"
            ):
                if model.kv_int8:
                    # The decode megakernels carry no KV dequant-scale
                    # plumbing, so an int8-KV model silently loses the
                    # fastest single-stream path (B=1 falls back to XLA).
                    # Name the tradeoff loudly (VERDICT r4 item 6): kv_int8
                    # is the BATCH/engine serving mode; single-stream models
                    # should load with kv_int8=False.
                    logger.warning(
                        "kv_int8=True disables the B=1 Pallas decode "
                        "megakernel (no int8-KV scale plumbing in-kernel); "
                        "single-stream decode falls back to the XLA path "
                        "(~1.4x slower per frame). Use kv_int8 for batch/"
                        "engine serving, not single-stream models "
                        "(docs/SERVING.md)."
                    )
                # Whole-backbone Pallas decode kernel (B=1): stash the packed
                # uniform-chunk weight layout alongside the params so the
                # jitted step streams it directly (ops/fused_backbone.py).
                # The head constants (input_linear/out_norm/EOS/bos) ride
                # along so decode_step can fold the head ops in-kernel too.
                t = model.params["flow_lm"]["transformer"]
                t["fused"] = pack_backbone_int8(t["layers"])
                t["fused_head"] = pack_backbone_head(model.params["flow_lm"])
                try:
                    from pocket_tts_tpu.ops.fused_segment import pack_flow_bf16

                    # Whole-segment kernel chunks (opt-in dispatch —
                    # POCKET_TTS_FUSED_SEGMENT=1; see ops/fused_segment.py).
                    t["fused_segment"] = pack_flow_bf16(
                        model.params["flow_lm"]["flow_net"]
                    )
                except ValueError as e:
                    # Named so an opted-in POCKET_TTS_FUSED_SEGMENT=1 run
                    # can't silently benchmark the scan path instead.
                    logger.warning("whole-segment kernel unavailable: %s", e)
                _probe_fused_compile(model)
        if mesh is not None:
            from pocket_tts_tpu.parallel.mesh import shard_params

            model.params = shard_params(mesh, model.params)
        # _load_weights / cast_serving_dtype / quantize_int8 rebuild the
        # params pytree, so the conditioner constructed in __init__ would
        # otherwise keep embedding with the discarded random-init table.
        model.conditioner.embed_weight = model.params["flow_lm"]["conditioner"][
            "embed"
        ]["weight"]
        logger.info(
            "TTS Model loaded successfully. Size ~%d MB",
            size_of_pytree(model.params) // 1_000_000,
        )
        return model

    def _load_weights(self, cfg: Config, dtype, allow_random_init: bool) -> None:
        """Checkpoint resolution mirroring reference tts_model.py:105-199."""
        if cfg.flow_lm.weights_path is not None:
            if cfg.mimi.weights_path is None:
                raise ValueError(
                    "If you specify flow_lm.weights_path you should specify mimi.weights_path"
                )
            flat = load_safetensors(download_if_necessary(str(cfg.flow_lm.weights_path)))
            n, s = load_state_dict(self.params["flow_lm"], flat, dtype)
            logger.info("Loaded FlowLM state dict: %d tensors (%d skipped)", n, s)
            flat = load_safetensors(download_if_necessary(str(cfg.mimi.weights_path)))
            n, s = load_state_dict(self.params["mimi"], flat, dtype, strip_prefix="model.")
            logger.info("Loaded Mimi state dict: %d tensors (%d skipped)", n, s)

        if cfg.weights_path is not None:
            weights_file = None
            try:
                weights_file = download_if_necessary(cfg.weights_path)
            except Exception:
                self.has_voice_cloning = False
                try:
                    weights_file = download_if_necessary(cfg.weights_path_without_voice_cloning)
                except Exception:
                    if not allow_random_init:
                        raise
                    self.random_init = True
                    logger.warning(
                        "No checkpoint reachable (offline?). Using RANDOM weights — "
                        "audio will be noise. Pass a local path in the config to fix."
                    )
            if weights_file is not None:
                flat = load_safetensors(weights_file)
                loaded, skipped = load_state_dict(self.params, flat, dtype)
                logger.info("Loaded %d weights, skipped %d", loaded, skipped)

        if cfg.flow_lm.weights_path is None and cfg.weights_path is None:
            logger.warning("No weights_path specified, model is uninitialized!")

    def save_checkpoint(self, path) -> int:
        """Write current params as a torch-layout safetensors file that
        load_model can consume via a local weights_path (and that the
        reference implementations can read). Functional analogue of
        reference convert_and_save_mlx_weights (weight_conversion.py:161-174)."""
        from pocket_tts_tpu.models.weights import save_checkpoint

        return save_checkpoint(self.params, path)

    def profile(self, log_dir: str):
        """Context manager: capture a jax profiler trace of everything run
        inside (view with TensorBoard / xprof). TPU analogue of the
        reference's wall-clock-only timing (utils/utils.py:28-46)."""
        return jax.profiler.trace(log_dir)

    # ------------------------------------------------------------------ mesh

    def _place_batch(self, tree, batch_size: int):
        """Place a per-stream state/carry/input pytree on the mesh (batch dim
        over dp, KV head axes over tp); identity when single-device.
        device_put on an already-correctly-placed leaf is a no-op, so calling
        this on every generation is free after the first placement."""
        if self.mesh is None:
            return tree
        from pocket_tts_tpu.parallel.mesh import shard_batch_tree

        return shard_batch_tree(self.mesh, tree, batch_size)

    # ------------------------------------------------------------------ jits

    def _jit(self, key, builder):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = builder()
            self._jit_cache[key] = fn
        return fn

    def _precision(self):
        return jax.default_matmul_precision(self.matmul_precision)

    def _prefill_jit(self, B: int, T: int, capacity: int):
        def build():
            flow_lm = self.flow_lm

            def fn_tokens(params, state, tokens, lengths):
                with self._precision():
                    emb = flow_lm.embed_text(params["flow_lm"], tokens)
                    return flow_lm.prefill(params["flow_lm"], state, emb, lengths)

            def fn_cond(params, state, cond, lengths):
                with self._precision():
                    return flow_lm.prefill(params["flow_lm"], state, cond, lengths)

            return {
                "tokens": jax.jit(fn_tokens),
                "cond": jax.jit(fn_cond),
            }

        return self._jit(("prefill", B, T, capacity), build)

    def _clone_jit(self):
        """Jitted deep-copy: returns fresh device buffers (x + 0 forces real
        outputs rather than aliasing), so a cached template survives being
        fed into donating jits."""
        def build():
            return jax.jit(
                lambda t: jax.tree_util.tree_map(lambda x: x + jnp.zeros((), x.dtype), t)
            )

        return self._jit(("clone",), build)

    def _mimi_frame_jit(self, B: int):
        def build():
            mimi = self.mimi

            def fn(params, latent, mimi_state):
                with self._precision():
                    return decode_mimi_frame(
                        params["flow_lm"], params["mimi"], mimi, latent, mimi_state
                    )

            return jax.jit(fn)

        return self._jit(("mimi_frame", B), build)

    def _batch_attn_ok(self, B: int) -> bool:
        """Static gate for the Pallas batched decode-attention kernel
        (ops/batch_attention.py): B>1 decode on a single TPU chip, and
        only when POCKET_TTS_BATCH_ATTN=1 opts in (measured in-context
        negative result — see batch_attn_enabled). Under a mesh the
        attention stays on XLA dot_generals (GSPMD partitions those; a
        pallas_call would need explicit shard_map plumbing).
        POCKET_TTS_FUSED_INTERPRET=1 lets CPU tests drive the production
        dispatch in interpret mode."""
        from pocket_tts_tpu.ops.batch_attention import batch_attn_enabled
        from pocket_tts_tpu.ops.fused_backbone import fused_interpret_enabled

        return (
            B > 1
            and self.mesh is None
            and batch_attn_enabled()
            and (jax.devices()[0].platform == "tpu" or fused_interpret_enabled())
        )

    def _segment_jit(self, B: int, S: int, capacity: int, read_limit: int | None = None):
        lsd_steps = self.lsd_decode_steps
        noise_clamp = self.noise_clamp

        def build():
            # Unrolling the decode scan removes per-iteration loop overhead
            # (~17% per frame at S=32 on v5e); worth the compile time for the
            # larger steady-state segments only.
            unroll = 4 if S >= 16 else (2 if S >= 8 else 1)
            inner = make_segment_fn(
                self.flow_lm, self.mimi, lsd_steps, noise_clamp, S, unroll=unroll,
                emit_pcm16=self.transfer_pcm16, read_limit=read_limit,
                batch_kernel=self._batch_attn_ok(B),
            )

            def fn(params, flow_state, mimi_state, carry, rng, temp, eos_threshold):
                with self._precision():
                    return inner(params, flow_state, mimi_state, carry, rng, temp, eos_threshold)

            return jax.jit(fn, donate_argnums=(1, 2, 3))

        return self._jit(
            ("segment", B, S, capacity, read_limit, lsd_steps, noise_clamp,
             self.transfer_pcm16),
            build,
        )

    def _compact_jit(self, B: int, capacity: int, donate: bool = False):
        """Jitted KV compaction (flow_lm.compact_state is ~20 eager gather /
        argsort dispatches otherwise — slow enough on a remote runtime to
        stall live streams; the engine precompiles this at startup).

        `donate` frees the old cache in place (engine-owned state); the plain
        API keeps donate=False because the input tree may be aliased by a
        caller-held voice state."""

        def build():
            flow_lm = self.flow_lm

            def fn(state, new_written):
                return flow_lm.compact_state(state, new_written)

            return jax.jit(fn, donate_argnums=(0,) if donate else ())

        return self._jit(("compact", B, capacity, donate), build)

    def _encode_audio_jit(self, B: int, T: int):
        def build():
            mimi = self.mimi
            flow_lm = self.flow_lm

            def fn(params, audio):
                with self._precision():
                    encoded = mimi.encode_to_latent(params["mimi"], audio)  # [B, 512, T']
                    latents = jnp.transpose(encoded, (0, 2, 1)).astype(jnp.float32)
                    return flow_lm.project_speaker(params["flow_lm"], latents)

            return jax.jit(fn)

        return self._jit(("encode_audio", B, T), build)

    # ------------------------------------------------------------------ voice state

    def _encode_audio(self, audio: np.ndarray) -> jnp.ndarray:
        """Waveform [B, C, T] -> speaker conditioning [B, T', d_model]
        (reference: tts_model.py:271-276).

        The waveform is zero-padded to a power-of-2 bucket of codec frames so
        the encoder compiles O(log) programs instead of one per distinct
        prompt length (minutes each on remote-compile backends). The whole
        encode chain is causal — left-padded convs (ops/conv.py) and causal
        windowed attention — so the first `n_valid` output frames are
        unaffected by tail padding (parity pinned in
        tests/test_voice_cloning.py)."""
        audio = np.asarray(audio, dtype=np.float32)
        frame = self.frame_size
        n_frames = max(1, -(-audio.shape[-1] // frame))  # ceil: frames at 12.5 Hz
        bucket = 1 << (n_frames - 1).bit_length()  # next power of 2
        pad = bucket * frame - audio.shape[-1]
        if pad:
            audio = np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
        fn = self._encode_audio_jit(audio.shape[0], audio.shape[-1])
        return fn(self.params, jnp.asarray(audio))[:, :n_frames, :]

    def get_state_for_audio_prompt(
        self, audio_conditioning: Union[Path, str, np.ndarray], truncate: bool = False
    ) -> ModelState:
        """Build the FlowLM state for a voice: predefined name, WAV path/URI,
        or a raw [C, T] / [T] waveform array (reference: tts_model.py:484-518)."""
        if isinstance(audio_conditioning, str) and audio_conditioning in PREDEFINED_VOICES:
            tensors = None
            try:
                voice_file = download_if_necessary(PREDEFINED_VOICES[audio_conditioning])
                tensors = load_safetensors(voice_file)
            except Exception:
                # With random weights (offline dev/bench), a synthetic prompt
                # keeps the pipeline runnable; with real weights this is an error.
                if not self.random_init:
                    raise
                logger.warning(
                    "Voice asset '%s' unreachable; using a synthetic random prompt "
                    "(weights are random anyway).",
                    audio_conditioning,
                )
                seed = sum(audio_conditioning.encode())
                prompt = (
                    jax.random.normal(
                        jax.random.PRNGKey(seed), (1, 125, self.flow_lm.dim), dtype=jnp.float32
                    )
                    * 0.02
                )
            if tensors is not None:
                # A readable-but-malformed asset is an error even offline.
                if "audio_prompt" not in tensors:
                    raise KeyError("audio_prompt not found in voice embedding file")
                raw = np.asarray(tensors["audio_prompt"])
                # Shape contract of the published voice assets: [1, T, d_model]
                # float (reference: pocket_tts_mlx/utils/weight_conversion.py:78-89).
                if raw.ndim != 3 or raw.shape[0] != 1 or raw.shape[2] != self.flow_lm.dim:
                    raise ValueError(
                        f"voice embedding 'audio_prompt' must be [1, T, "
                        f"{self.flow_lm.dim}], got {tuple(raw.shape)}"
                    )
                if raw.dtype.kind != "f":
                    raise ValueError(
                        f"voice embedding 'audio_prompt' must be floating point, "
                        f"got {raw.dtype}"
                    )
                prompt = jnp.asarray(raw, dtype=jnp.float32)
        else:
            if not self.has_voice_cloning and isinstance(audio_conditioning, (str, Path)):
                raise ValueError(VOICE_CLONING_UNSUPPORTED)
            if isinstance(audio_conditioning, str):
                audio_conditioning = download_if_necessary(audio_conditioning)
            if isinstance(audio_conditioning, Path):
                audio, sr = audio_read(audio_conditioning)
                if truncate:
                    max_samples = int(30 * sr)
                    if audio.shape[-1] > max_samples:
                        audio = audio[..., :max_samples]
                        logger.info("Audio truncated to 30 seconds")
                audio_conditioning = convert_audio(audio, sr, self.sample_rate, 1)
            wav = np.asarray(audio_conditioning)
            if wav.ndim == 1:  # raw [T] -> [C=1, T] (arrays are assumed 24 kHz mono)
                wav = wav[None, :]
            with display_execution_time("Encoding audio prompt"):
                prompt = self._encode_audio(wav[None, ...])
                prompt.block_until_ready()

        return self._state_from_prompt(prompt)

    def _state_from_prompt(self, prompt: jnp.ndarray) -> ModelState:
        """Prefill a fresh KV cache with conditioning embeddings [B, T, dim]."""
        B, T, _ = prompt.shape
        capacity = _bucket(T)
        state = self._place_batch(
            self.flow_lm.init_state(B, capacity, dtype=self.flow_state_dtype), B
        )
        lengths = jnp.full((B,), T, dtype=jnp.int32)
        fns = self._prefill_jit(B, T, capacity)
        with display_execution_time("Prompting audio"):
            state = fns["cond"](self.params, state, prompt, lengths)
            jax.block_until_ready(state)
        model_state = ModelState(state, [T] * B, written=T)
        logger.info(
            "Size of the model state for audio prompt: %d MB",
            model_state.size_bytes() // 1_000_000,
        )
        return model_state

    def _cached_get_state_for_audio_prompt(
        self, audio_conditioning: Union[Path, str], truncate: bool = False
    ) -> ModelState:
        """Two-entry cache mirroring reference tts_model.py:478-482."""
        key = (str(audio_conditioning), truncate)
        if key not in self._voice_state_cache:
            if len(self._voice_state_cache) >= 2:
                self._voice_state_cache.pop(next(iter(self._voice_state_cache)))
            self._voice_state_cache[key] = self.get_state_for_audio_prompt(
                audio_conditioning, truncate
            )
        return self._voice_state_cache[key]

    # ------------------------------------------------------------------ generation

    def generate_audio(
        self,
        model_state: ModelState,
        text_to_generate: str,
        max_tokens: int = MAX_TOKEN_PER_CHUNK,
        frames_after_eos: Optional[int] = None,
        copy_state: bool = True,
        trim_start_ms: int = 0,
        fade_in_ms: int = 0,
        warmup_frames: int = _MIMI_WARMUP_FRAMES,
    ) -> np.ndarray:
        """Generate a full utterance as a 1-D float32 waveform at 24 kHz."""
        chunks = list(
            self.generate_audio_stream(
                model_state=model_state,
                text_to_generate=text_to_generate,
                max_tokens=max_tokens,
                frames_after_eos=frames_after_eos,
                copy_state=copy_state,
                warmup_frames=warmup_frames,
                _bulk=True,
            )
        )
        audio = np.concatenate(chunks, axis=0)
        return self._postprocess_audio_start(audio, trim_start_ms, fade_in_ms)

    def generate_audio_stream(
        self,
        model_state: ModelState,
        text_to_generate: str,
        max_tokens: int = MAX_TOKEN_PER_CHUNK,
        frames_after_eos: Optional[int] = None,
        copy_state: bool = True,
        warmup_frames: int = _MIMI_WARMUP_FRAMES,
        _bulk: bool = False,
    ) -> Generator[np.ndarray, None, None]:
        """Yield 80 ms audio frames (1920 float32 samples) as they decode."""
        chunks = split_into_best_sentences(self.tokenizer, text_to_generate, max_tokens)
        for chunk in chunks:
            _, frames_after_eos_guess = prepare_text_prompt(chunk)
            frames_after_eos_guess += 2
            effective = (
                frames_after_eos if frames_after_eos is not None else frames_after_eos_guess
            )
            yield from self._generate_stream_chunk(
                model_state=model_state,
                text=chunk,
                frames_after_eos=effective,
                copy_state=copy_state,
                warmup_frames=warmup_frames,
                bulk=_bulk,
            )

    def _next_rng(self) -> jax.Array:
        # Split on the host CPU backend: an eager split on the accelerator
        # costs a dispatch round-trip per utterance (~5 ms through a relay)
        # for an 8-byte computation. The key uploads with the segment args.
        self._rng, sub = _split_key_cpu(self._rng)
        # numpy, not a CPU-committed jax array: uncommitted keys upload with
        # the accelerator dispatch instead of fighting device placement.
        return np.asarray(sub)

    def _generate_stream_chunk(
        self,
        model_state: ModelState,
        text: str,
        frames_after_eos: int,
        copy_state: bool,
        warmup_frames: int,
        bulk: bool = False,
    ) -> Generator[np.ndarray, None, None]:
        """Single-chunk generation for batch size 1 (the reference code path)."""
        for frames, _ in self._generate_batch_frames(
            model_state=model_state,
            texts=[text],
            frames_after_eos=[frames_after_eos],
            copy_state=copy_state,
            warmup_frames=warmup_frames,
            bulk=bulk,
        ):
            yield frames[0]

    def _generate_batch_frames(
        self,
        model_state: ModelState,
        texts: Sequence[str],
        frames_after_eos: Sequence[int],
        copy_state: bool,
        warmup_frames: int,
        segment_frames: int = DEFAULT_SEGMENT_FRAMES,
        bulk: bool = False,
    ):
        """Core batched decode loop.

        Yields (frames, emit) pairs per generated step, where frames is
        [B, frame_size] float32 and emit is [B] bool. Generator-based so both
        the streaming API and the batch API share one implementation.
        """
        tree = model_state.tree
        B = model_state.batch_size
        if len(texts) != B or len(frames_after_eos) != B:
            raise ValueError(
                f"model_state holds {B} stream(s) but got {len(texts)} text(s); "
                "use generate_audio_batch for batched states"
            )

        # Tokenize through the conditioner protocol (prepare -> TokenizedText),
        # the same surface reference users consume (conditioners/text.py).
        token_lists = [self.conditioner.prepare(t).tokens[0].tolist() for t in texts]
        token_counts = [len(t) for t in token_lists]
        max_gen = [
            estimate_max_gen_len(
                c,
                self.config.mimi.frame_rate,
                self._TOKENS_PER_SECOND_ESTIMATE,
                self._GEN_SECONDS_PADDING,
            )
            for c in token_counts
        ]
        t_pad = _bucket(max(token_counts), 32)
        tokens = np.zeros((B, t_pad), dtype=np.int32)
        for b, toks in enumerate(token_lists):
            tokens[b, : len(toks)] = toks
        lengths = np.asarray(token_counts, dtype=np.int32)

        max_gen_all = int(max(max_gen))
        bulk_sched = _bulk_schedule(max_gen_all) if bulk else None
        stream_sched = (
            None if bulk else _stream_schedule(max_gen_all, segment_frames)
        )
        dispatch_budget = sum(bulk_sched if bulk else stream_sched)
        # Slot-indexed cache: capacity counts every write (incl. padding),
        # not stream positions. Before growing to a new bucket (= a new jit
        # compilation), try compacting the dead slots out — long
        # copy_state=False sessions then stay within one bucket as long as
        # their *valid* history fits (engine-style compaction, VERDICT item).
        capacity_now = self.flow_lm.state_capacity(tree)
        required = model_state.written + t_pad + dispatch_budget
        if _bucket(required) > capacity_now:
            # The write index is data, not shape: align to the 8-sublane
            # granularity only (the KV capacity itself stays bucketed).
            compact_written = -(-(max(model_state.pos) + 1) // 8) * 8
            required_after = compact_written + t_pad + dispatch_budget
            if compact_written < model_state.written and _bucket(required_after) < _bucket(
                required
            ):
                tree = self._compact_jit(B, capacity_now)(
                    tree, jnp.int32(compact_written)
                )
                model_state.tree = tree
                model_state.written = compact_written
                required = required_after
        capacity = _bucket(required)
        if self.flow_lm.state_capacity(tree) < capacity:
            tree = self.flow_lm.expand_state(tree, capacity)
        else:
            capacity = self.flow_lm.state_capacity(tree)
        if B == 1:
            # Probe the kernels at this bucket BEFORE the segment programs
            # jit against it: a Mosaic rejection specific to an unusual
            # capacity then demotes that bucket here (one warning, XLA
            # fallback) instead of crashing mid-request (VERDICT r3 item 4).
            self.ensure_buckets_probed([capacity])
        # Mesh mode: (re)place the working state — a no-op for leaves already
        # sharded (voice states from _state_from_prompt), real placement for
        # freshly expanded or host-built trees.
        tree = self._place_batch(tree, B)

        # Mimi decoder state + warmup (reference: tts_model.py:464-476). The
        # zero-latent warmup is deterministic and voice-independent, so the
        # warmed state is computed once per (B, chunk, warmup) shape and
        # reused — generation then starts with zero extra dispatches.
        # Ring capacity must cover the largest chunk vocoded in one call; for
        # streaming use the steady-state cap regardless of utterance length
        # so every utterance shares ONE set of compiled shapes.
        max_chunk = (
            max(bulk_sched, default=1) if bulk else _stream_steady(segment_frames)
        )
        warm_key = ("warm_mimi", B, max_chunk, warmup_frames)
        warm_template = self._jit_cache.get(warm_key)
        if warm_template is None:
            warm_template = self._place_batch(
                self.mimi.init_decode_state(
                    B, kv_dtype=self.state_dtype, max_chunk_frames=max_chunk
                ),
                B,
            )
            if warmup_frames > 0:
                frame_fn = self._mimi_frame_jit(B)
                zero_latent = jnp.zeros((B, self.flow_lm.ldim), dtype=jnp.float32)
                for _ in range(warmup_frames):
                    _, warm_template = frame_fn(self.params, zero_latent, warm_template)
            self._jit_cache[warm_key] = warm_template
        # The segment jit donates its mimi_state argument, so hand it a fresh
        # device copy of the warmed template (one dispatch).
        mimi_state = self._clone_jit()(warm_template)

        t_generating = time.monotonic()
        prefill = self._prefill_jit(B, t_pad, capacity)["tokens"]
        # np arrays upload at the call boundary (no separate eager transfers);
        # under a mesh they are dp-placed so the prefill batch-shards.
        if self.mesh is not None:
            tokens = self._place_batch(tokens, B)
            lengths = self._place_batch(lengths, B)
        flow_state = prefill(self.params, tree, tokens, lengths)

        carry = self._place_batch(initial_carry(self.flow_lm, B, frames_after_eos, max_gen), B)
        rng = self._next_rng()
        # Cached device scalars: no per-utterance transfer for constants.
        const_key = ("consts", self.temp, self.eos_threshold)
        consts = self._jit_cache.get(const_key)
        if consts is None:
            consts = (jnp.float32(self.temp), jnp.float32(self.eos_threshold))
            self._jit_cache[const_key] = consts
        temp, eos_threshold = consts

        def schedule_iter():
            # Bulk: big segments + one bucketed tail (see _bulk_schedule):
            # fewest dispatch round-trips, small masked overshoot.
            # Streaming: tiny first segments then doubling (_stream_schedule).
            yield from (bulk_sched if bulk else stream_sched)

        # Pipelined dispatch: keep `lookahead` segments in flight beyond the
        # one being fetched, so device compute and device->host transfers
        # overlap instead of a round-trip sync per segment. Dispatching past
        # EOS wastes at most lookahead*segment_frames masked frames; the
        # position correction below rewinds the state either way.
        #
        # Bulk mode dispatches the ENTIRE schedule before the single fetch:
        # the caller collects everything anyway, and the max_gen bound is
        # tight (~2 s of padding), so skipping the per-segment early-stop
        # round-trips costs a little masked compute and saves one host sync
        # per segment.
        #
        # Streaming starts at 2 (protects time-to-first-audio: only three
        # ~2 ms dispatches precede the first fetch) and doubles after every
        # fetch — within a few yields the whole remaining schedule is in
        # flight, so long utterances converge to bulk's wall clock while the
        # early segments still early-stop on EOS.
        lookahead = 10**9 if bulk else 2
        fetch_quota = 1  # streaming: segments fetched per device_get, doubling
        sched = schedule_iter()
        in_flight: list = []
        dispatched = 0
        exhausted = False
        total_emitted_samples = 0
        eos_step_fetched = None

        # KV read-limit bucketing: the batch decode is cache-READ bound, and
        # at dispatch time the host knows exactly how many front rows are
        # live (written + this segment's appends). Each segment program
        # reads only that 128-bucketed prefix instead of the whole capacity
        # — ~C/valid x fewer attention bytes early in the utterance. B=1
        # dispatches skip it (the megakernel path ignores it, and the XLA
        # fallback there is host-latency bound, not read bound).
        written_host = model_state.written + t_pad
        use_read_limit = B > 1 and env_flag("POCKET_TTS_READ_LIMIT", True)

        while True:
            while not exhausted and len(in_flight) <= lookahead:
                seg = next(sched, None)
                if seg is None:
                    exhausted = True
                    break
                read_limit = None
                if use_read_limit:
                    r = _bucket(written_host + seg)
                    read_limit = r if r < capacity else None
                written_host += seg
                seg_fn = self._segment_jit(B, seg, capacity, read_limit)
                flow_state, mimi_state, carry, audio, emit, all_done = seg_fn(
                    self.params, flow_state, mimi_state, carry, rng, temp, eos_threshold
                )
                for dev_arr in (audio, emit, all_done):
                    dev_arr.copy_to_host_async()
                in_flight.append((seg, audio, emit, all_done))
                dispatched += seg
            if not in_flight:
                break
            if bulk:
                # One transfer for the whole utterance — including the final
                # eos_step the epilogue needs (a separate device_get after the
                # loop would cost one more relay round-trip).
                fetched, eos_step_fetched = jax.device_get(
                    ([(a, e) for _, a, e, _ in in_flight], carry["eos_step"])
                )
                segs = [seg for seg, *_ in in_flight]
                in_flight = []
                done = True
            else:
                # Fetch a GROWING batch of segments per device_get (1, 4,
                # 16, ...): the round-trip dominates small fetches, so
                # fetching one segment per RTT caps streaming at ~N RTTs for
                # N segments while compute finishes far ahead of realtime.
                # The first fetch stays single-segment (time-to-first-audio
                # unchanged); later fetches batch, so total fetch RTTs are
                # O(log N) and long streams converge to bulk's wall clock
                # (measured through the ~20 ms-RTT relay: streaming went
                # 0.44x -> 0.70x of bulk with x2 growth; x4 cuts another
                # RTT or two). Blocking on a batch of already-dispatched
                # segments is safe for streaming cadence: decode runs two
                # orders of magnitude faster than playback, so even the
                # largest batch computes well inside one 80 ms frame budget.
                # On top of the quota, drain any further segments that
                # report ready (free when the backend exposes completion;
                # some relays never do).
                take = min(len(in_flight), fetch_quota)
                fetch_quota = min(fetch_quota * 4, 10**9)
                while take < len(in_flight) and all(
                    x.is_ready() for x in in_flight[take][1:]
                ):
                    take += 1
                batch, in_flight = in_flight[:take], in_flight[take:]
                items = [(a, e, d) for _, a, e, d in batch]
                if exhausted and not in_flight:
                    # Final fetch: every segment is dispatched, so `carry`
                    # already holds the final eos_step — piggyback it here
                    # instead of paying the epilogue's own round-trip.
                    got, eos_step_fetched = jax.device_get(
                        (items, carry["eos_step"])
                    )
                else:
                    got = jax.device_get(items)
                fetched = [(a, e) for a, e, _ in got]
                segs = [s for s, *_ in batch]
                done = got[-1][2]
                lookahead = min(lookahead * 2, 10**9)
            for seg, (audio_np, emit_np) in zip(segs, fetched):
                if audio_np.dtype == np.int16:  # transfer_pcm16: widen on host
                    audio_np = audio_np.astype(np.float32) / 32767.0
                for s in range(seg):
                    if not emit_np[:, s].any():
                        continue
                    total_emitted_samples += int(emit_np[:, s].sum()) * audio_np.shape[-1]
                    yield audio_np[:, s, :], emit_np[:, s]
            if bool(done):
                break

        # Restore exact continuation semantics: FlowLM ran
        # min(eos_step + frames_after_eos + 1, max_gen) steps per stream in the
        # reference loop (tts_model.py:402-412); rewind positions past any
        # extra masked steps and invalidate the cache slots they wrote.
        eos_step_np = (
            np.asarray(eos_step_fetched)
            if eos_step_fetched is not None
            else np.asarray(jax.device_get(carry["eos_step"]))
        )
        steps_entered = np.minimum(
            np.minimum(eos_step_np + np.asarray(frames_after_eos) + 1, np.asarray(max_gen)),
            dispatched,
        )
        new_pos = [
            int(p + c + s) for p, c, s in zip(model_state.pos, token_counts, steps_entered)
        ]
        if not copy_state:
            model_state.tree = self.flow_lm.invalidate_after(
                flow_state, jnp.asarray(new_pos, dtype=jnp.int32)
            )
            model_state.pos = new_pos
            model_state.written = model_state.written + t_pad + dispatched

        duration_ms = int(total_emitted_samples / B * 1000 / self.sample_rate)
        generation_ms = int((time.monotonic() - t_generating) * 1000)
        rtf = duration_ms / max(1, generation_ms)
        logger.info(
            "Generated: %d ms of audio in %d ms so %.2fx faster than real-time",
            duration_ms,
            generation_ms,
            rtf,
        )

    def generate_audio_batch(
        self,
        model_states: Union[ModelState, Sequence[ModelState]],
        texts: Sequence[str],
        frames_after_eos: Optional[int] = None,
        warmup_frames: int = _MIMI_WARMUP_FRAMES,
        trim_start_ms: int = 0,
        fade_in_ms: int = 0,
    ) -> list[np.ndarray]:
        """Decode many utterances concurrently on one chip (TPU-native
        capability; the reference synthesizes strictly one stream at a time).

        Each text must fit in a single chunk (use generate_audio for long
        scripts). model_states may be one shared voice or one per stream.
        """
        if isinstance(model_states, ModelState):
            if model_states.batch_size == len(texts):
                batched = model_states  # already stacked
            elif model_states.batch_size == 1:
                batched = stack_states(self.flow_lm, [model_states] * len(texts))
            else:
                raise ValueError(
                    f"model_states has batch {model_states.batch_size} but got "
                    f"{len(texts)} texts"
                )
        else:
            batched = stack_states(self.flow_lm, list(model_states))

        fae = []
        for t in texts:
            _, guess = prepare_text_prompt(t)
            fae.append(frames_after_eos if frames_after_eos is not None else guess + 2)

        per_stream: list[list[np.ndarray]] = [[] for _ in texts]
        for frames, emit in self._generate_batch_frames(
            model_state=batched,
            texts=list(texts),
            frames_after_eos=fae,
            copy_state=True,
            warmup_frames=warmup_frames,
            bulk=True,
        ):
            for b in range(len(texts)):
                if emit[b]:
                    per_stream[b].append(frames[b])

        out = []
        for chunks in per_stream:
            audio = (
                np.concatenate(chunks, axis=0) if chunks else np.zeros((0,), dtype=np.float32)
            )
            out.append(self._postprocess_audio_start(audio, trim_start_ms, fade_in_ms))
        return out

    # ------------------------------------------------------------------ post

    def _postprocess_audio_start(
        self, audio: np.ndarray, trim_start_ms: int, fade_in_ms: int
    ) -> np.ndarray:
        """Trim/fade the onset (reference: tts_model.py:446-462)."""
        sample_rate = self.sample_rate
        if trim_start_ms > 0:
            trim = int(sample_rate * trim_start_ms / 1000)
            if 0 < trim < audio.shape[0]:
                audio = audio[trim:]
        if fade_in_ms > 0 and audio.shape[0] > 1:
            fade = int(sample_rate * fade_in_ms / 1000)
            fade = min(max(0, fade), audio.shape[0])
            if fade > 1:
                ramp = np.linspace(0.0, 1.0, fade, dtype=audio.dtype)
                audio = np.concatenate([audio[:fade] * ramp, audio[fade:]], axis=0)
        return audio


def stack_states(flow_lm: FlowLMModel, states: Sequence[ModelState]) -> ModelState:
    """Stack single-stream voice states into one batched state.

    Capacities are equalized to the largest bucket and write indices aligned
    to the maximum (slots between a stream's own writes and the common index
    are invalid and never attended), so voices with different prompt lengths
    batch together.
    """
    if len(states) == 1 and states[0].batch_size > 1:
        return states[0]
    capacity = max(flow_lm.state_capacity(s.tree) for s in states)
    trees = [flow_lm.expand_state(s.tree, capacity) for s in states]

    def stack_leaf(*leaves):
        if leaves[0].ndim == 0:  # widx: batch-common write index
            return jnp.max(jnp.stack(leaves))
        return jnp.concatenate(leaves, axis=0)

    batched = jax.tree_util.tree_map(stack_leaf, *trees)
    pos = [p for s in states for p in s.pos]
    batched["pos"] = jnp.asarray(pos, dtype=jnp.int32)
    written = max(s.written for s in states)
    return ModelState(batched, pos, written=written)

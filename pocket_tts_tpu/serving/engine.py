"""Continuous-batching TTS engine: many concurrent streams on one chip.

New TPU-native capability (the reference synthesizes exactly one utterance at
a time in a Python loop; SURVEY §2.3). The engine owns B decode *slots* whose
state lives persistently on device:

  - FlowLM slot-indexed KV caches + positions  (models/flow_lm.py)
  - Mimi vocoder streaming state               (models/mimi.py)
  - decode carry (per-slot step/EOS counters)  (models/generate.py)

Each tick runs ONE fused jitted program — batched prefill for newly admitted
requests (inactive slots prefill length 0, writing only invalid positions)
followed by an S-frame decode segment — so admission never stalls running
streams and the device never idles between requests. Completed slots are
retired on the host from the fetched emit masks and immediately reusable.

The slot-indexed cache writes at a batch-common index that only grows; when
the write index approaches capacity the engine *compacts*: every slot's valid
entries are gathered to the front of its row (one gather, amortized over
~capacity frames).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.default_parameters import DEFAULT_SEGMENT_FRAMES, MAX_TOKEN_PER_CHUNK
from pocket_tts_tpu.models.generate import initial_carry, make_segment_fn
from pocket_tts_tpu.models.text import (
    estimate_max_gen_len,
    prepare_text_prompt,
    split_into_best_sentences,
)
from pocket_tts_tpu.models.tts_model import ModelState, TTSModel

logger = logging.getLogger(__name__)

_EOS_NEVER = 2**30


class EngineOverloaded(RuntimeError):
    """Raised by submit() when the engine's pending backlog is full.

    Admission control (VERDICT r4 item 1): past saturation, queueing only
    converts every new request's TTFA into unbounded wait — the correct
    serving behavior is to SHED load at the front door and tell the client
    when to retry. `retry_after_s` estimates when a slot's worth of backlog
    will have drained (from the engine's recent completion rate); HTTP
    frontends surface it as `503` + `Retry-After` (serving/server.py)."""

    def __init__(self, retry_after_s: float):
        self.retry_after_s = float(retry_after_s)
        super().__init__(
            f"engine backlog full; retry after ~{self.retry_after_s:.1f}s"
        )


@dataclass
class RequestHandle:
    """Consumer side of a submitted request: iterate frames() for audio."""

    request_id: int
    text: str
    # Wall-clock submit() time; with record_frame_times=True,
    # frame_times[0] - submit_time is this stream's TTFA under load
    # (queue wait + admission + prefill + first decode segment).
    submit_time: float = 0.0
    # Wall-clock arrival time of every delivered frame (engine-side enqueue;
    # populated when the engine runs with record_frame_times=True). Feed to
    # frame_lateness() to check real-time playback deadlines.
    frame_times: list = field(default_factory=list)
    # Playback-lead bookkeeping (always tracked; drives preemption): when the
    # first frame was delivered and how many frames have been delivered. A
    # player that started at the first frame has consumed
    # (now - _first_frame_time) seconds and holds
    # _frames_delivered * frame_seconds of audio.
    _first_frame_time: Optional[float] = None
    _frames_delivered: int = 0
    _queue: "queue.Queue[Optional[np.ndarray]]" = field(default_factory=queue.Queue)
    _done: threading.Event = field(default_factory=threading.Event)
    # Remaining sentence chunks for long texts: each chunk restarts from the
    # voice state, matching the reference's per-chunk copy_state semantics
    # (tts_model.py:346-361, :372-373).
    _chunks: list = field(default_factory=list)
    _voice: Optional[ModelState] = None
    _cancelled: threading.Event = field(default_factory=threading.Event)

    def cancel(self) -> None:
        """Stop decoding this request (e.g. the client disconnected). Frames
        already queued remain readable; the stream ends at the next tick."""
        self._cancelled.set()

    def frames(self):
        """Yield 1920-sample float32 frames until the utterance completes."""
        while True:
            frame = self._queue.get()
            if frame is None:
                return
            yield frame

    def audio(self) -> np.ndarray:
        """Block until completion and return the full waveform."""
        chunks = list(self.frames())
        if not chunks:
            return np.zeros((0,), dtype=np.float32)
        return np.concatenate(chunks, axis=0)

    @property
    def done(self) -> bool:
        return self._done.is_set()


@dataclass
class _Slot:
    active: bool = False
    handle: Optional[RequestHandle] = None
    emitted: int = 0
    epoch: int = -1  # admission generation; guards stale pipelined deliveries


@dataclass
class _Parked:
    """A preempted stream parked in one lane of the device-resident store.

    The stream's full decode state (compacted FlowLM KV row, Mimi streaming
    state, mid-flight carry) lives in lane `lane` of the engine's parking
    store — pre-allocated batch-P device trees written by ONE group-park
    dispatch and read back by ONE group-resume dispatch. The host keeps only
    these scalars. (The first preemption design lifted each stream out as
    its own B=1 tree: every park/resume was then a separate jit dispatch
    whose per-call arg marshaling — ~45 leaves each — measured ~2 s of host
    time for a 16-arrival churn burst through the remote-dispatch relay.)"""

    handle: RequestHandle
    lane: int  # parking-store lane holding this stream's state
    pos: int  # host mirror of the stream position
    valid: int  # upper bound on the row's valid KV entries (8-aligned)
    old_epoch: int  # epoch the stream held when parked (for stale-delivery cleanup)


class TTSEngine:
    """Slot-based continuous batching over the fused generate step."""

    def __init__(
        self,
        model: TTSModel,
        slots: int = 8,
        segment_frames: int = DEFAULT_SEGMENT_FRAMES,
        capacity: int = 4096,
        text_pad: int = 64,
        warmup_frames: int = 1,
        emit_pcm16: bool = False,
        record_frame_times: bool = False,
        max_capacity: Optional[int] = None,
        first_segment_frames: int = 2,
        prefill_buckets: tuple = (16, 32),
        preempt: bool = True,
        max_parked: Optional[int] = None,
        preempt_min_lead_s: float = 0.35,
        resume_urgent_lead_s: float = 0.6,
        swap_margin_s: float = 0.5,
        max_swaps_per_tick: int = 4,
        max_pending: Optional[int] = None,
    ):
        self.model = model
        self.num_slots = slots
        self.segment_frames = segment_frames
        self.capacity = capacity
        self.text_pad = text_pad
        # Prefill width buckets (ascending, always ending in text_pad): an
        # admission prefills at the smallest width covering its longest
        # text. All widths precompile at startup.
        self.prefill_buckets = tuple(
            sorted({w for w in prefill_buckets if 0 < w < text_pad} | {text_pad})
        )
        # Dynamic capacity: a submit() whose KV need exceeds `capacity` is
        # accepted and the cache grows to the next bucket at a tick boundary
        # (expand + one recompile, amortized) up to `max_capacity`; only
        # beyond that is it rejected. Default headroom: 4x the initial size.
        # The ceiling is aligned DOWN to the capacity bucket grid so growth
        # (which buckets UP) can never exceed it.
        from pocket_tts_tpu.default_parameters import KV_CAPACITY_BUCKET

        raw_max = 4 * capacity if max_capacity is None else max_capacity
        self.max_capacity = max(
            capacity, (raw_max // KV_CAPACITY_BUCKET) * KV_CAPACITY_BUCKET
        )
        self._target_capacity = capacity
        self.warmup_frames = warmup_frames
        self.emit_pcm16 = emit_pcm16
        self.record_frame_times = record_frame_times
        # Preemption: an arrival that finds every slot busy may PARK the
        # running stream with the most buffered playback lead (its player has
        # seconds of audio in hand, so pausing its decode stalls nothing) and
        # take the slot; parked streams resume into freed slots, urgent-first.
        # This turns mid-churn admission TTFA from "wait for a whole
        # utterance to retire" (~seconds) into one park + admit + prefill +
        # short segment (~100 ms).
        self.preempt = preempt
        self.max_parked = min(slots, 16) if max_parked is None else max_parked
        self.preempt_min_lead_s = preempt_min_lead_s
        self.resume_urgent_lead_s = resume_urgent_lead_s
        # Swap-back: an URGENT parked stream (lead < resume_urgent_lead_s)
        # may preempt a running stream whose lead exceeds its own by
        # swap_margin_s. Rotating slots like this approximates processor
        # sharing when logical streams exceed slots: leads equalize instead
        # of the parked stream stalling while it waits for a retirement.
        self.swap_margin_s = swap_margin_s
        self.max_swaps_per_tick = max_swaps_per_tick
        # Admission control: submit() raises EngineOverloaded once the
        # not-yet-admitted backlog (pending queue + deferred list) reaches
        # max_pending. None = unbounded (library back-compat; a long batch
        # script may legitimately queue thousands). Server frontends should
        # always bound it (serving/server.py defaults to 2*slots) — an
        # unbounded queue just converts overload into unbounded TTFA.
        self.max_pending = max_pending
        self.rejected = 0  # observability: submits shed by admission control
        # Recent completion timestamps (utterances, not chunks) — the
        # drain-rate estimate behind EngineOverloaded.retry_after_s.
        self._completions: list = []
        self.frame_seconds = 1.0 / float(model.config.mimi.frame_rate)

        flow_lm, mimi = model.flow_lm, model.mimi
        B = slots
        # Persistent slot state; under model.mesh (multi-chip serving) the
        # slots batch-shard over dp and KV heads over tp — every tick then
        # runs as one SPMD program with XLA collectives over ICI.
        self.flow_state = model._place_batch(
            flow_lm.init_state(B, capacity, dtype=model.flow_state_dtype), B
        )
        self.mimi_state = model._place_batch(
            mimi.init_decode_state(
                B, kv_dtype=model.state_dtype, max_chunk_frames=segment_frames
            ),
            B,
        )
        # max_gen = 0 marks a slot inactive (emit is always masked off).
        self.carry = model._place_batch(initial_carry(flow_lm, B, [0] * B, [0] * B), B)
        self._written = 0  # host mirror of the batch-common write index
        self._pos = [0] * B  # host mirror of per-slot stream positions
        self._warm_mimi_row = None  # cached warmed-up B=1 mimi state
        self._epoch_counter = 0
        self._retired_epochs: set[int] = set()
        self._voice_cache: dict = {}  # id(voice) -> capacity-expanded tree
        self._admit_jit = self._build_admit_fn()
        # Jitted KV compaction, precompiled NOW (identity on the fresh state):
        # left to compile lazily it would land mid-serving on the first
        # compaction and stall every live stream for the compile duration.
        self._compact_jit = model._compact_jit(B, capacity, donate=True)
        self.flow_state = self._compact_jit(self.flow_state, jnp.int32(0))
        # Compile every admission-group size now (no-op admissions): an
        # unseen size compiling mid-serving stalls every live stream.
        self._precompile_admission()

        self._slots = [_Slot() for _ in range(B)]
        self._parked: list[_Parked] = []
        self._parked_by_epoch: dict[int, _Parked] = {}
        self.preemptions = 0  # observability: total parks / resumes so far
        self.resumes = 0
        self.swaps = 0  # fused slot<->lane exchanges (counted in both above)
        # Tick-wall telemetry (run() loop): seconds per pipelined tick while
        # any stream is active. The tick wall bounds every latency the
        # engine can offer (admission wait, TTFA segments, delivery lag are
        # all counted in ticks), so sustained-load analysis starts here.
        self.tick_walls: list = []
        if self.preempt:
            # Device-resident parking store: max_parked lanes of slot-shaped
            # state, PLUS one scratch lane (index max_parked) that is never
            # allocated — precompiles park/resume round-trips through it, so
            # recompiling after capacity growth needs no free lane. All parks
            # of a tick write the store in ONE group dispatch; all resumes
            # read it in one (see _build_park_group_fn).
            P = self.max_parked + 1
            # Mesh placement: under model.mesh the store is placed with the
            # SAME rule as the batch state (_place_batch) — 4-D KV leaves
            # keep their head axis tp-sharded, so park/resume/swap never
            # reshard the big axis; the lane axis (P, odd) replicates over
            # dp, so a park is K row all-gathers over ICI (rows are small)
            # rather than a pathological resharding of the whole store.
            self._store_flow = model._place_batch(
                flow_lm.init_state(P, capacity, dtype=model.flow_state_dtype), P
            )
            self._store_mimi = model._place_batch(
                mimi.init_decode_state(
                    P, kv_dtype=model.state_dtype, max_chunk_frames=segment_frames
                ),
                P,
            )
            self._store_carry = model._place_batch(
                jax.tree_util.tree_map(
                    jnp.asarray, initial_carry(flow_lm, P, [0] * P, [0] * P)
                ),
                P,
            )
            self._free_lanes = list(range(self.max_parked))
            self._park_group_jit = self._build_park_group_fn()
            self._resume_group_jit = self._build_resume_group_fn()
            self._swap_group_jit = self._build_swap_group_fn()
            self._precompile_groups()
        self._pending: "queue.Queue[tuple[RequestHandle, ModelState, int, int, list[int]]]" = (
            queue.Queue()
        )
        self._next_id = 0
        self._lock = threading.Lock()

        def build_segment(frames: int):
            return jax.jit(
                make_segment_fn(
                    flow_lm, mimi, model.lsd_decode_steps, model.noise_clamp, frames,
                    unroll=2 if frames >= 8 else 1,
                    # On-device float32 -> int16 conversion inside the segment
                    # program halves the device->host audio bytes per tick (the
                    # server writes PCM16 anyway) at zero extra dispatches.
                    emit_pcm16=emit_pcm16,
                    # Pallas batched decode attention (single-chip TPU only;
                    # the mesh path keeps XLA dot_generals for GSPMD).
                    batch_kernel=model._batch_attn_ok(B),
                ),
                donate_argnums=(1, 2, 3),
            )

        self._segment = build_segment(segment_frames)
        # Short segment for the tick right after an admission: newly admitted
        # streams reach their first frame after `first_segment_frames` of
        # decode instead of a full segment — the dominant term of TTFA under
        # load. One extra compiled program; all slots advance together.
        self.first_segment_frames = max(1, min(first_segment_frames, segment_frames))
        self._segment_short = (
            build_segment(self.first_segment_frames)
            if self.first_segment_frames < segment_frames
            else self._segment
        )
        self._just_admitted = False
        self._ticks_since_short = 1 << 30  # first admission is always short
        self._deferred: list = []  # oversized items awaiting capacity growth
        # No donation on prefill: state leaves may alias (e.g. the
        # batch-common widx scalar is shared across layers after admission),
        # and XLA rejects donating one buffer twice.
        self._prefill = jax.jit(self._prefill_fn)
        self._precompile_prefill()
        self._silence_lane = jax.jit(
            lambda c, b: {**c, "max_gen": jax.lax.dynamic_update_slice(
                c["max_gen"], jnp.zeros((1,), c["max_gen"].dtype), (b,)
            )}
        )
        # Active-slot audio gather: the per-tick device->host audio transfer
        # ([B, S, 1920] PCM) is the tick-wall floor on link-limited runtimes
        # (the relay moves ~40 MB/s; a full 64x8 tick is ~2 MB), and every
        # engine latency is denominated in ticks. At partial occupancy only
        # the ACTIVE rows are fetched: one jitted row-gather (8-bucketed K,
        # one tiny executable per (K, S)) cuts the transfer proportionally.
        self._gather_rows = jax.jit(lambda audio, emit, idxs: (audio[idxs], emit[idxs]))
        self._precompile_gathers()
        self._snapshot = jax.jit(
            lambda c: (
                c["eos_step"] + 0,
                c["step"] + 0,
                c["frames_after_eos"] + 0,
                c["max_gen"] + 0,
            )
        )
        self._rng = jax.random.PRNGKey(1234)

    # ------------------------------------------------------------ jit bodies

    def _precompile_gathers(self):
        """Compile every active-row gather program NOW (one per (K bucket,
        segment length)): an unseen K otherwise compiles at the first
        partial-occupancy tick, mid-serving. Tiny programs; the persistent
        compilation cache makes this one-time across processes."""
        if self.model.mesh is not None:
            return  # mesh path never gathers (full fetch)
        audio_dtype = jnp.int16 if self.emit_pcm16 else jnp.float32
        frame = self.model.mimi.frame_size
        lengths = {self.first_segment_frames, self.segment_frames}
        for S in lengths:
            audio = jnp.zeros((self.num_slots, S, frame), audio_dtype)
            emit = jnp.zeros((self.num_slots, S), jnp.bool_)
            for K in range(8, self.num_slots, 8):
                self._gather_rows(audio, emit, np.zeros((K,), np.int32))


    def _prefill_fn(self, params, flow_state, tokens, lengths):
        emb = self.model.flow_lm.embed_text(params["flow_lm"], tokens)
        return self.model.flow_lm.prefill(params["flow_lm"], flow_state, emb, lengths)

    # ------------------------------------------------------------ submission

    def submit(
        self,
        text: str,
        voice_state: ModelState,
        frames_after_eos: Optional[int] = None,
        max_tokens: int = MAX_TOKEN_PER_CHUNK,
    ) -> RequestHandle:
        """Queue an utterance; returns a handle streaming its frames.

        Long texts are split into sentence chunks (same packing as the direct
        API); the handle's frames span all chunks in order.

        Raises EngineOverloaded (with a retry_after_s drain estimate) when
        max_pending is set and the not-yet-admitted backlog is full —
        shedding at the front door instead of letting TTFA degrade without
        bound past saturation.
        """
        if self.max_pending is not None:
            backlog = self.backlog
            if backlog >= self.max_pending:
                self.rejected += 1
                raise EngineOverloaded(self._estimate_retry_after(backlog))
        max_tokens = min(max_tokens, self.text_pad)
        chunks = split_into_best_sentences(self.model.tokenizer, text, max_tokens)

        def chunk_specs(chunk_text: str):
            _, guess = prepare_text_prompt(chunk_text)
            fae = frames_after_eos if frames_after_eos is not None else guess + 2
            tokens = self.model.tokenizer.encode(chunk_text)
            # A single sentence can exceed the prefill width (the splitter
            # never cuts inside a sentence): hard-split its token list rather
            # than silently truncating it.
            for start in range(0, len(tokens), self.text_pad):
                part = tokens[start : start + self.text_pad]
                max_gen = estimate_max_gen_len(
                    len(part),
                    self.model.config.mimi.frame_rate,
                    self.model._TOKENS_PER_SECOND_ESTIMATE,
                    self.model._GEN_SECONDS_PADDING,
                )
                yield (fae, max_gen, part)

        specs = [spec for c in chunks for spec in chunk_specs(c)]

        # Every chunk restarts from the voice prompt: the slot needs room for
        # voice writes + one prefill + the longest chunk's generated frames.
        worst = max(
            voice_state.written + self.text_pad + max_gen + 2 * self.segment_frames
            for _, max_gen, _ in specs
        )
        if worst > self.max_capacity:
            raise ValueError(
                f"request needs ~{worst} KV slots but the engine's max_capacity is "
                f"{self.max_capacity}; raise TTSEngine(max_capacity=...) or shorten "
                "the voice prompt"
            )
        if worst > self.capacity:
            # Grow at the next tick boundary (see _maybe_grow); the request
            # stays queued until the expanded cache can hold it.
            from pocket_tts_tpu.models.tts_model import _bucket

            with self._lock:
                # max_capacity is bucket-aligned (constructor), so the
                # bucketed target can never exceed it for an accepted worst.
                self._target_capacity = max(
                    self._target_capacity, min(_bucket(worst), self.max_capacity)
                )
        with self._lock:
            handle = RequestHandle(self._next_id, text, submit_time=time.monotonic())
            self._next_id += 1
        handle._voice = voice_state
        handle._chunks = specs[1:]
        fae, max_gen, tokens = specs[0]
        self._pending.put((handle, voice_state, fae, max_gen, tokens))
        return handle

    # ----------------------------------------------------- admission control

    @property
    def backlog(self) -> int:
        """Requests accepted but not yet decoding: queued + growth-deferred.
        Chunk continuations of already-admitted requests re-enter _pending
        and are counted — they hold capacity exactly like fresh arrivals."""
        return self._pending.qsize() + len(self._deferred)

    def _record_completion(self) -> None:
        now = time.monotonic()
        self._completions.append(now)
        if len(self._completions) > 256:
            del self._completions[:128]

    def _estimate_retry_after(self, backlog: int) -> float:
        """Seconds until roughly one backlog's worth of work drains, from
        the recent completion rate. With no completion history yet (cold
        engine slammed at startup) fall back to one utterance-ish estimate."""
        now = time.monotonic()
        recent = [t for t in self._completions[-64:] if now - t < 30.0]
        if len(recent) >= 2 and now > recent[0]:
            rate = len(recent) / (now - recent[0])  # completions/s
            est = (backlog - self.num_slots + 1) / max(rate, 1e-3)
        else:
            est = 1.0
        return float(min(max(est, 0.5), 30.0))

    # ------------------------------------------------------------ admission

    def _build_admit_fn(self):
        """Jitted burst admission: splice K rows of ONE voice in ONE dispatch.

        Slot indices arrive as a [K] numpy array, so one compiled executable
        per group size K serves every slot combination, and each state leaf
        is written by a SINGLE scatter (`.at[slots].set`) of the voice row
        broadcast K ways. The earlier design chained K per-row
        dynamic_update_slices and passed K separate voice trees + 4K eager
        device scalars per call — measured 110 ms of host arg marshaling plus
        ~170 ms of device time for a cold 64-burst (benchmarks/cold_burst.py);
        the scatter form writes the same rows in one pass of each leaf.
        Duplicate slot indices (group padding repeats the last item) write
        identical rows, so the scatter stays deterministic."""

        def splice(batch_leaf, row_leaf, slots):
            if batch_leaf.ndim == 0:
                return batch_leaf  # batch-common scalars (widx) handled below
            rows = jnp.broadcast_to(
                row_leaf.astype(batch_leaf.dtype),
                (slots.shape[0],) + row_leaf.shape[1:],
            )
            return batch_leaf.at[slots].set(rows)

        def admit_fn(flow_state, mimi_state, carry, voice_tree, warm_mimi,
                     slots, pos0s, faes, max_gens, widx_new):
            transformer = jax.tree_util.tree_map(
                lambda bl, rl: splice(bl, rl, slots),
                flow_state["transformer"],
                voice_tree["transformer"],
            )
            transformer["widx"] = jnp.maximum(
                flow_state["transformer"]["widx"], widx_new
            )
            flow_state = {
                "transformer": transformer,
                "pos": flow_state["pos"].at[slots].set(pos0s),
            }
            mimi_state = jax.tree_util.tree_map(
                lambda bl, rl: splice(bl, rl, slots), mimi_state, warm_mimi
            )
            K = slots.shape[0]
            carry = {
                "latent": carry["latent"].at[slots].set(
                    jnp.zeros((K, carry["latent"].shape[1]), carry["latent"].dtype)
                ),
                "is_bos": carry["is_bos"].at[slots].set(
                    jnp.ones((K,), jnp.bool_)
                ),
                "eos_step": carry["eos_step"].at[slots].set(
                    jnp.full((K,), _EOS_NEVER, carry["eos_step"].dtype)
                ),
                "step": carry["step"].at[slots].set(
                    jnp.zeros((K,), carry["step"].dtype)
                ),
                "tick": carry["tick"],
                "frames_after_eos": carry["frames_after_eos"].at[slots].set(
                    faes.astype(carry["frames_after_eos"].dtype)
                ),
                "max_gen": carry["max_gen"].at[slots].set(
                    max_gens.astype(carry["max_gen"].dtype)
                ),
            }
            return flow_state, mimi_state, carry

        return jax.jit(admit_fn, donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------ preemption

    def _group_sizes(self) -> list[int]:
        """Compiled park/resume group sizes {1, 4, 16, ...} capped at the
        lane count; groups pad up by repeating their last (slot, lane) pair
        (idempotent gather/scatter). Same rationale as _admit_sizes."""
        sizes, k = [], 1
        while k < self.max_parked:
            sizes.append(k)
            k *= 4
        sizes.append(self.max_parked)
        return sizes

    def _build_park_group_fn(self):
        """Jitted group park: lift K slots' decode state into K lanes of the
        device-resident store in ONE dispatch.

        Each state leaf is read by a single gather `leaf[slots]` and written
        by a single scatter `store.at[lanes].set(rows)`; the gathered FlowLM
        rows are compacted (valid entries to the row front, per row) so
        resuming is exactly the admission splice-at-front contract with
        `widx >= valid`. Duplicate (slot, lane) pairs — group padding repeats
        the last pair — write identical rows, so the scatter stays
        deterministic. The batch state is read-only; the store is donated."""
        flow_lm = self.model.flow_lm

        def park_fn(flow_state, mimi_state, carry,
                    store_flow, store_mimi, store_carry, slots, lanes):
            def take(leaf):
                if getattr(leaf, "ndim", 0) == 0:
                    return leaf  # batch-common scalars (widx/tick)
                return leaf[slots]

            def put(store_leaf, row_leaf):
                if getattr(store_leaf, "ndim", 0) == 0:
                    return store_leaf
                return store_leaf.at[lanes].set(row_leaf.astype(store_leaf.dtype))

            rows_flow = jax.tree_util.tree_map(take, flow_state)
            rows_flow = flow_lm.compact_state(rows_flow, 0)  # per-row front-gather
            store_flow = jax.tree_util.tree_map(put, store_flow, rows_flow)
            store_mimi = jax.tree_util.tree_map(
                put, store_mimi, jax.tree_util.tree_map(take, mimi_state)
            )
            store_carry = jax.tree_util.tree_map(
                put, store_carry, jax.tree_util.tree_map(take, carry)
            )
            return store_flow, store_mimi, store_carry

        return jax.jit(park_fn, donate_argnums=(3, 4, 5))

    def _build_resume_group_fn(self):
        """Jitted group resume: scatter K parked lanes back into K slots in
        ONE dispatch — the mirror of group admission, except the carry
        resumes mid-flight values (step/EOS counters) and the Mimi rows are
        the streams' own streaming state rather than the shared warm row.
        The store is read-only (lanes are recycled host-side); the batch
        state is donated."""

        def resume_fn(flow_state, mimi_state, carry,
                      store_flow, store_mimi, store_carry, lanes, slots, widx_new):
            def take(leaf):
                if getattr(leaf, "ndim", 0) == 0:
                    return leaf
                return leaf[lanes]

            def put(batch_leaf, row_leaf):
                if getattr(batch_leaf, "ndim", 0) == 0:
                    return batch_leaf  # keep batch-common scalars (widx/tick)
                return batch_leaf.at[slots].set(row_leaf.astype(batch_leaf.dtype))

            rows_flow = jax.tree_util.tree_map(take, store_flow)
            transformer = jax.tree_util.tree_map(
                put, flow_state["transformer"], rows_flow["transformer"]
            )
            # Every resumed row's entries sit in [0, valid); the batch write
            # index must clear the largest (same contract as voice admission).
            transformer["widx"] = jnp.maximum(flow_state["transformer"]["widx"], widx_new)
            flow_state = {
                "transformer": transformer,
                "pos": put(flow_state["pos"], rows_flow["pos"]),
            }
            mimi_state = jax.tree_util.tree_map(
                put, mimi_state, jax.tree_util.tree_map(take, store_mimi)
            )
            carry = jax.tree_util.tree_map(
                put, carry, jax.tree_util.tree_map(take, store_carry)
            )
            return flow_state, mimi_state, carry

        return jax.jit(resume_fn, donate_argnums=(0, 1, 2))

    def _build_swap_group_fn(self):
        """Jitted group swap: exchange K victim slots' decode state with K
        parked lanes' state in ONE dispatch — a fused park+resume.

        The separate park-then-resume pair cannot express a swap when every
        lane is occupied (park needs a free lane to write before resume can
        vacate one), which is exactly the steady state swap-back exists for:
        more logical streams than slots, every lane holding a parked stream.
        The fused form has no such hazard — all reads (slot rows, lane rows)
        are of the program's INPUTS, so victim rows land in the very lanes
        the resumed streams vacate. Duplicate pad pairs write identical
        values, like the park/resume groups. Everything is donated: each
        buffer's rows are disjointly either kept or replaced."""
        flow_lm = self.model.flow_lm

        def swap_fn(flow_state, mimi_state, carry,
                    store_flow, store_mimi, store_carry, slots, lanes, widx_new):
            def take_slot(leaf):
                if getattr(leaf, "ndim", 0) == 0:
                    return leaf
                return leaf[slots]

            def take_lane(leaf):
                if getattr(leaf, "ndim", 0) == 0:
                    return leaf
                return leaf[lanes]

            def put_lane(store_leaf, row_leaf):
                if getattr(store_leaf, "ndim", 0) == 0:
                    return store_leaf
                return store_leaf.at[lanes].set(row_leaf.astype(store_leaf.dtype))

            def put_slot(batch_leaf, row_leaf):
                if getattr(batch_leaf, "ndim", 0) == 0:
                    return batch_leaf
                return batch_leaf.at[slots].set(row_leaf.astype(batch_leaf.dtype))

            # Victim slot rows -> lanes (front-compacted, the park contract).
            victims_flow = flow_lm.compact_state(
                jax.tree_util.tree_map(take_slot, flow_state), 0
            )
            new_store_flow = jax.tree_util.tree_map(put_lane, store_flow, victims_flow)
            new_store_mimi = jax.tree_util.tree_map(
                put_lane, store_mimi, jax.tree_util.tree_map(take_slot, mimi_state)
            )
            new_store_carry = jax.tree_util.tree_map(
                put_lane, store_carry, jax.tree_util.tree_map(take_slot, carry)
            )
            # Lane rows -> slots (the resume contract, incl. widx clearing).
            rows_flow = jax.tree_util.tree_map(take_lane, store_flow)
            transformer = jax.tree_util.tree_map(
                put_slot, flow_state["transformer"], rows_flow["transformer"]
            )
            transformer["widx"] = jnp.maximum(flow_state["transformer"]["widx"], widx_new)
            flow_state = {
                "transformer": transformer,
                "pos": put_slot(flow_state["pos"], rows_flow["pos"]),
            }
            mimi_state = jax.tree_util.tree_map(
                put_slot, mimi_state, jax.tree_util.tree_map(take_lane, store_mimi)
            )
            carry = jax.tree_util.tree_map(
                put_slot, carry, jax.tree_util.tree_map(take_lane, store_carry)
            )
            return flow_state, mimi_state, carry, new_store_flow, new_store_mimi, new_store_carry

        return jax.jit(swap_fn, donate_argnums=(0, 1, 2, 3, 4, 5))

    def _precompile_groups(self):
        """Compile every park/resume group size NOW by round-tripping a slot
        through the scratch lane. Without this the first preemption of an
        unseen group size compiles mid-serving and stalls every live stream.

        The round-trip is lossless even on an ACTIVE slot (growth-time
        recompiles can find every slot busy): park compacts a COPY of the
        slot's row into the scratch lane, and resuming it back writes the
        front-compacted row over the original — a layout change attention is
        invariant to (validity is per-entry slot_pos, and widx only grows)."""
        b = next((i for i, s in enumerate(self._slots) if not s.active), 0)
        for k in self._group_sizes():
            slots = np.full((k,), b, np.int32)
            lanes = np.full((k,), self.max_parked, np.int32)  # scratch lane
            self._store_flow, self._store_mimi, self._store_carry = self._park_group_jit(
                self.flow_state, self.mimi_state, self.carry,
                self._store_flow, self._store_mimi, self._store_carry, slots, lanes,
            )
            # Swap b <-> scratch: writes compact(b) over slot b (a layout
            # change attention is invariant to) and compact(b) into scratch
            # again — lossless, because park above just made scratch a copy
            # of b's compacted row.
            (
                self.flow_state, self.mimi_state, self.carry,
                self._store_flow, self._store_mimi, self._store_carry,
            ) = self._swap_group_jit(
                self.flow_state, self.mimi_state, self.carry,
                self._store_flow, self._store_mimi, self._store_carry,
                slots, lanes, jnp.int32(0),
            )
            self.flow_state, self.mimi_state, self.carry = self._resume_group_jit(
                self.flow_state, self.mimi_state, self.carry,
                self._store_flow, self._store_mimi, self._store_carry,
                lanes, slots, jnp.int32(0),
            )

    def _lead(self, handle: RequestHandle, now: float) -> Optional[float]:
        """Seconds of audio the stream's player holds beyond its playhead.

        None until the first frame is delivered (a stream with no audio out
        yet must never be preempted — that would wreck its TTFA)."""
        t0 = handle._first_frame_time
        if t0 is None:
            return None
        return handle._frames_delivered * self.frame_seconds - (now - t0)

    def _execute_parks(self, plan: list[tuple[int, float]]) -> None:
        """Park the planned victim slots — ONE group dispatch for all of
        them. plan: [(slot, lead)]; caller guarantees a free lane each."""
        lanes = [self._free_lanes.pop() for _ in plan]
        k = next(s for s in self._group_sizes() if s >= len(plan))
        pad = k - len(plan)
        slots_arr = np.asarray([b for b, _ in plan] + [plan[-1][0]] * pad, np.int32)
        lanes_arr = np.asarray(lanes + [lanes[-1]] * pad, np.int32)
        self._store_flow, self._store_mimi, self._store_carry = self._park_group_jit(
            self.flow_state, self.mimi_state, self.carry,
            self._store_flow, self._store_mimi, self._store_carry,
            slots_arr, lanes_arr,
        )
        for (b, lead), lane in zip(plan, lanes):
            slot = self._slots[b]
            parked = _Parked(
                handle=slot.handle,
                lane=lane,
                pos=self._pos[b],
                valid=min(-(-(self._pos[b] + 1) // 8) * 8, self.capacity),
                old_epoch=slot.epoch,
            )
            self._parked.append(parked)
            self._parked_by_epoch[slot.epoch] = parked
            self.preemptions += 1
            logger.info(
                "engine: parked request %d from slot %d into lane %d (lead %.2f s)",
                slot.handle.request_id, b, lane, lead,
            )
            slot.active = False
            slot.handle = None

    def _drop_parked(self, parked: _Parked) -> None:
        self._parked.remove(parked)
        self._parked_by_epoch.pop(parked.old_epoch, None)
        self._free_lanes.append(parked.lane)

    def _execute_resumes(self, plan: list[tuple[_Parked, int]]) -> bool:
        """Resume the planned parked streams into their slots — ONE group
        dispatch for all of them. Streams cancelled while parked are finished
        for free (their slot stays empty this tick)."""
        live = []
        for parked, b in plan:
            if parked not in self._parked:
                continue  # dropped (retired in a stale in-flight segment)
            if parked.handle._cancelled.is_set():
                self._drop_parked(parked)
                handle = parked.handle
                handle._chunks.clear()
                if not handle.done:
                    handle._queue.put(None)
                    handle._done.set()
                continue
            live.append((parked, b))
        if not live:
            return False
        k = next(s for s in self._group_sizes() if s >= len(live))
        pad = k - len(live)
        lanes_arr = np.asarray(
            [p.lane for p, _ in live] + [live[-1][0].lane] * pad, np.int32
        )
        slots_arr = np.asarray([b for _, b in live] + [live[-1][1]] * pad, np.int32)
        widx_new = max(p.valid for p, _ in live)
        self.flow_state, self.mimi_state, self.carry = self._resume_group_jit(
            self.flow_state, self.mimi_state, self.carry,
            self._store_flow, self._store_mimi, self._store_carry,
            lanes_arr, slots_arr, jnp.int32(widx_new),
        )
        self._written = max(self._written, widx_new)
        for parked, b in live:
            self._drop_parked(parked)
            self._pos[b] = parked.pos
            slot = self._slots[b]
            slot.active = True
            slot.handle = parked.handle
            self._epoch_counter += 1
            slot.epoch = self._epoch_counter
            self.resumes += 1
            logger.info(
                "engine: resumed request %d into slot %d", parked.handle.request_id, b
            )
        return True

    def _execute_swaps(self, plan: list[tuple["_Parked", int, float]]) -> bool:
        """Swap the planned (parked stream, victim slot) pairs — ONE group
        dispatch exchanging slot rows with lane rows, so no free lane is
        needed (see _build_swap_group_fn). plan: [(parked, slot, victim_lead)].
        Streams cancelled while parked are finished for free and their pair
        is dropped (the victim keeps its slot this tick)."""
        live = []
        for parked, b, lead in plan:
            if parked not in self._parked:
                continue
            if parked.handle._cancelled.is_set():
                self._drop_parked(parked)
                handle = parked.handle
                handle._chunks.clear()
                if not handle.done:
                    handle._queue.put(None)
                    handle._done.set()
                continue
            live.append((parked, b, lead))
        if not live:
            return False
        k = next(s for s in self._group_sizes() if s >= len(live))
        pad = k - len(live)
        lanes_arr = np.asarray(
            [p.lane for p, _, _ in live] + [live[-1][0].lane] * pad, np.int32
        )
        slots_arr = np.asarray([b for _, b, _ in live] + [live[-1][1]] * pad, np.int32)
        widx_new = max(p.valid for p, _, _ in live)
        (
            self.flow_state, self.mimi_state, self.carry,
            self._store_flow, self._store_mimi, self._store_carry,
        ) = self._swap_group_jit(
            self.flow_state, self.mimi_state, self.carry,
            self._store_flow, self._store_mimi, self._store_carry,
            slots_arr, lanes_arr, jnp.int32(widx_new),
        )
        self._written = max(self._written, widx_new)
        for parked, b, lead in live:
            slot = self._slots[b]
            victim = _Parked(
                handle=slot.handle,
                lane=parked.lane,  # the lane the resumed stream vacates
                pos=self._pos[b],
                valid=min(-(-(self._pos[b] + 1) // 8) * 8, self.capacity),
                old_epoch=slot.epoch,
            )
            self._parked.remove(parked)
            self._parked_by_epoch.pop(parked.old_epoch, None)
            self._parked.append(victim)
            self._parked_by_epoch[victim.old_epoch] = victim
            self._pos[b] = parked.pos
            slot.active = True
            slot.handle = parked.handle
            self._epoch_counter += 1
            slot.epoch = self._epoch_counter
            self.preemptions += 1
            self.resumes += 1
            self.swaps += 1
            logger.info(
                "engine: swapped request %d (lead %.2f s) out of slot %d for "
                "parked request %d (lane %d)",
                victim.handle.request_id, lead, b,
                parked.handle.request_id, parked.lane,
            )
        return True

    def _pick_victims(self, want: int, now: float, exclude: set) -> list[int]:
        """Slots safe to preempt, most playback lead first. A victim must
        have delivered its first frame and hold more than preempt_min_lead_s
        of audio lead — pausing it then cannot stall its player before the
        engine gets a chance to resume it."""
        scored = []
        for b, slot in enumerate(self._slots):
            if not slot.active or b in exclude:
                continue
            lead = self._lead(slot.handle, now)
            if lead is not None and lead > self.preempt_min_lead_s:
                scored.append((lead, b))
        scored.sort(reverse=True)
        return [b for _, b in scored[:want]]

    def _sweep_parked(self) -> None:
        """Terminate parked streams whose client cancelled while they waited."""
        for parked in list(self._parked):
            if parked.handle._cancelled.is_set():
                self._drop_parked(parked)
                handle = parked.handle
                handle._chunks.clear()
                if not handle.done:
                    handle._queue.put(None)
                    handle._done.set()

    def _expanded_voice(self, voice_state: ModelState):
        """Voice tree padded to engine capacity (cached: expansion is ~15
        eager ops, and voices are reused across many requests). The cache
        entry holds a strong reference to the ModelState so its id() cannot
        be recycled onto a different voice."""
        key = id(voice_state)
        hit = self._voice_cache.get(key)
        if hit is None or hit[0] is not voice_state:
            tree = self.model.flow_lm.expand_state(voice_state.tree, self.capacity)
            if len(self._voice_cache) >= 16:
                self._voice_cache.pop(next(iter(self._voice_cache)))
            hit = (voice_state, tree)
            self._voice_cache[key] = hit
        return hit[1]

    def _admit_sizes(self) -> list[int]:
        """The fixed set of compiled admission-group sizes: {1, 8, 64, ...}
        capped at the slot count. Groups pad UP to the nearest size by
        repeating their last item (idempotent splice), so at most
        log8(slots)+1 admission executables ever exist — each compile is
        O(10 s) on remote-compile backends and would otherwise stall every
        live stream the first time an unseen group size arrives mid-serving."""
        sizes, k = [], 1
        while k < self.num_slots:
            sizes.append(k)
            k *= 8
        sizes.append(self.num_slots)
        return sizes

    def _precompile_prefill(self):
        """Compile every prefill width NOW (no-op prefills with length 0,
        results discarded — prefill does not donate, so the live state is
        untouched). An unseen width otherwise compiles at the first
        admission that needs it, mid-serving."""
        B = self.num_slots
        for w in self.prefill_buckets:
            self._prefill(
                self.model.params,
                self.flow_state,
                self.model._place_batch(np.zeros((B, w), np.int32), B),
                self.model._place_batch(np.zeros((B,), np.int32), B),
            )

    def _warm_mimi(self):
        """Warmed B=1 Mimi row: the zero-latent warmup is deterministic and
        voice-independent, so it is computed once and spliced everywhere."""
        if self._warm_mimi_row is None:
            flow_lm, mimi, model = self.model.flow_lm, self.model.mimi, self.model
            row_mimi = mimi.init_decode_state(
                1, kv_dtype=model.state_dtype, max_chunk_frames=self.segment_frames
            )
            if self.warmup_frames > 0:
                frame_fn = model._mimi_frame_jit(1)
                zero_latent = jnp.zeros((1, flow_lm.ldim), dtype=jnp.float32)
                for _ in range(self.warmup_frames):
                    _, row_mimi = frame_fn(model.params, zero_latent, row_mimi)
            self._warm_mimi_row = row_mimi
        return self._warm_mimi_row

    def _precompile_admission(self):
        """Compile every admission-group size NOW, at startup, by running
        no-op admissions (zero voice rows into slot 0 with max_gen=0 — the
        inactive-slot encoding) on the fresh state. Without this, the first
        mid-serving admission of an unseen group size compiles under live
        traffic and every active stream stalls for the duration (measured
        ~14 s per size through a remote-compile relay)."""
        slots = getattr(self, "_slots", None)  # not yet built during __init__
        b = 0
        if slots is not None:
            b = next((i for i, s in enumerate(slots) if not s.active), None)
            if b is None:  # growth with every slot busy: compile on first use
                logger.warning(
                    "engine: no inactive slot for admission precompile; "
                    "group sizes will compile at first admission"
                )
                return
        dummy_voice = self.model.flow_lm.init_state(
            1, self.capacity, dtype=self.model.flow_state_dtype
        )
        warm = self._warm_mimi()
        for k in self._admit_sizes():
            zeros = np.zeros((k,), np.int32)
            self.flow_state, self.mimi_state, self.carry = self._admit_jit(
                self.flow_state,
                self.mimi_state,
                self.carry,
                dummy_voice,
                warm,
                np.full((k,), b, np.int32),
                zeros,
                zeros,
                zeros,  # max_gen = 0 -> the slot stays inactive
                jnp.int32(self._written),
            )

    def _admit_group(self, items: list) -> list:
        """Splice a group of admissions in one jitted dispatch.

        items: [(b, handle, voice_state, fae, max_gen, tokens)]. Groups pad
        up to the nearest compiled size (see _admit_sizes) by repeating the
        last item — splicing the same row twice is idempotent.
        Returns [(b, tokens)] for the batched prefill.
        """
        self._warm_mimi()

        admitted = []
        # One scatter-admit call per UNIQUE voice: the typical burst shares a
        # single voice, so a cold 64-burst is ONE dispatch with one voice
        # tree (the old per-row design marshaled 64 trees + 256 eager device
        # scalars per burst — see _build_admit_fn).
        by_voice: dict[int, list] = {}
        for it in items:
            by_voice.setdefault(id(it[2]), []).append(it)
        for group_items in by_voice.values():
            start = 0
            while start < len(group_items):
                orig = group_items[start : start + self.num_slots]
                start += len(orig)
                k = next(s for s in self._admit_sizes() if s >= len(orig))
                # Pad to the compiled size by repeating the last item
                # (duplicate scatter indices write identical rows); slot
                # bookkeeping below iterates `orig` only.
                group = orig + [orig[-1]] * (k - len(orig))
                voice_state = orig[0][2]
                # The batch write index must clear the spliced voice's own
                # writes, otherwise the next prefill would overwrite voice
                # KV rows.
                self._written = max(self._written, voice_state.written)
                self.flow_state, self.mimi_state, self.carry = self._admit_jit(
                    self.flow_state,
                    self.mimi_state,
                    self.carry,
                    self._expanded_voice(voice_state),
                    self._warm_mimi_row,
                    np.asarray([b for b, *_ in group], np.int32),
                    np.asarray(
                        [voice_state.pos[0]] * len(group), np.int32
                    ),
                    np.asarray([fae for *_, fae, _, _ in group], np.int32),
                    np.asarray([mg for *_, mg, _ in group], np.int32),
                    jnp.int32(self._written),
                )
                self._admit_bookkeep(orig, admitted)
        return admitted

    def _admit_bookkeep(self, orig: list, admitted: list) -> None:
        for b, handle, voice_state, fae, max_gen, tokens in orig:
            self._pos[b] = voice_state.pos[0]
            slot = self._slots[b]
            slot.active = True
            slot.handle = handle
            slot.emitted = 0
            self._epoch_counter += 1
            slot.epoch = self._epoch_counter
            logger.info(
                "engine: admitted request %d into slot %d", handle.request_id, b
            )
            admitted.append((b, tokens))

    def _prefill_admitted(self, admitted: list[tuple[int, list[int]]]):
        """One batched prefill for all newly admitted slots (others length 0)."""
        B = self.num_slots
        # Width-bucketed prefill: pad to the smallest compiled width that
        # fits the longest admitted text instead of always text_pad — the
        # batched prefill is ~1 ms of device time per 16 positions at B=64,
        # a direct term of TTFA under load, and narrower widths also write
        # fewer padding rows into the shared KV (less compaction pressure).
        # Every width precompiles at startup (_precompile_prefill).
        longest = max((len(toks) for _, toks in admitted), default=0)
        width = next(w for w in self.prefill_buckets if w >= min(longest, self.text_pad))
        tokens = np.zeros((B, width), dtype=np.int32)
        lengths = np.zeros((B,), dtype=np.int32)
        for b, toks in admitted:
            toks = toks[:width]
            tokens[b, : len(toks)] = toks
            lengths[b] = len(toks)
            self._pos[b] += len(toks)
        self.flow_state = self._prefill(
            self.model.params,
            self.flow_state,
            self.model._place_batch(tokens, B),
            self.model._place_batch(lengths, B),
        )
        self._written += width

    # ------------------------------------------------------------ growth

    def _maybe_grow(self):
        """Expand the KV cache to the pending target capacity (set by an
        oversized submit). Runs at a tick boundary: no segment is mid-flight
        on the old shapes, so this is one functional expand + one jit
        recompile of the capacity-keyed programs — amortized over the life
        of the larger cache (VERDICT r2 item 7)."""
        with self._lock:
            target = self._target_capacity
        if target <= self.capacity:
            return
        logger.info(
            "engine: growing KV capacity %d -> %d", self.capacity, target
        )
        B = self.num_slots
        self.flow_state = self.model._place_batch(
            self.model.flow_lm.expand_state(self.flow_state, target), B
        )
        self.capacity = target
        self._voice_cache.clear()  # cached voices are padded to the old size
        # The parking store's lanes must match the batch cache's capacity at
        # resume time (parked entries sit compacted at the row front, so
        # zero-padding the tail is lossless).
        if self.preempt:
            self._store_flow = self.model._place_batch(
                self.model.flow_lm.expand_state(self._store_flow, target),
                self.max_parked + 1,
            )
        self._compact_jit = self.model._compact_jit(B, target, donate=True)
        # New capacity = new shapes for the admission and prefill programs.
        self._precompile_admission()
        self._precompile_prefill()
        if self.preempt:
            self._precompile_groups()
        # Compile the new compaction program now (and reclaim dead slots
        # while at it) instead of stalling live streams at first use.
        max_valid = -(-(max(self._pos) + 1) // 8) * 8
        if max_valid < self._written:
            self.flow_state = self._compact_jit(self.flow_state, jnp.int32(max_valid))
            self._written = max_valid
        else:
            self.flow_state = self._compact_jit(
                self.flow_state, jnp.int32(self._written)
            )

    # ------------------------------------------------------------ compaction

    def _maybe_compact(self):
        """Gather each slot's valid cache entries to the row front when the
        shared write index nears capacity."""
        budget = self.text_pad + 4 * self.segment_frames
        if self._written + budget < self.capacity:
            return
        logger.info("engine: compacting KV cache (written=%d)", self._written)
        # 8-sublane alignment; the write index is data, not a tensor shape.
        max_valid = -(-(max(self._pos) + 1) // 8) * 8
        self.flow_state = self._compact_jit(self.flow_state, jnp.int32(max_valid))
        self._written = max_valid

    # ------------------------------------------------------------ main loop

    def _admit_pending(self, block_seconds: float = 0.0) -> bool:
        """Admit queued requests; returns True if slot contents changed.

        Slot assignment order within a tick:
          1. URGENT parked streams (playback lead below resume_urgent_lead_s)
             take free slots first — their lead drains in real time.
          2. Pending new requests take the remaining free slots; if there are
             none left, they PREEMPT the running streams with the most
             buffered lead (see _pick_victims) — a new arrival's TTFA then
             costs one park + admit + prefill + short segment instead of a
             wait for a whole utterance to retire.
          3. Remaining parked streams fill any slots still free.

        With block_seconds > 0 the first fetch blocks briefly — used by the
        run loop when fully idle so it doesn't busy-spin a CPU core.

        The tick PLANS all slot moves first, then EXECUTES them as at most
        three jitted dispatches — one group park (all victims), one group
        admission (+ one prefill), one group resume — regardless of how many
        streams move. The first preemption design dispatched per slot; a
        16-arrival churn burst then cost ~32 dispatches of full-state arg
        marshaling (~2 s of host time through the remote-dispatch relay),
        which WAS the mid-churn TTFA problem.
        """
        from pocket_tts_tpu.models.tts_model import _bucket

        self._maybe_grow()
        self._sweep_parked()
        now = time.monotonic()
        free = [b for b, s in enumerate(self._slots) if not s.active]
        touched: set = set()  # slots (re)filled this tick: not preemptable
        plan_park: list[tuple[int, float]] = []  # (slot, lead)
        plan_resume: list[tuple[_Parked, int]] = []  # (parked, slot)
        plan_swap: list[tuple[_Parked, int, float]] = []  # (parked, slot, lead)
        planned: set = set()  # id(parked) already planned for resume/swap

        if self._parked:
            urgent = sorted(
                (
                    p
                    for p in self._parked
                    if (self._lead(p.handle, now) or 0.0) < self.resume_urgent_lead_s
                ),
                key=lambda p: self._lead(p.handle, now) or 0.0,
            )
            for parked in urgent:
                if not free:
                    break
                b = free.pop(0)
                plan_resume.append((parked, b))
                planned.add(id(parked))
                touched.add(b)
            # Swap-back: urgent parked streams with no free slot trade places
            # with running streams holding swap_margin_s more lead — leads
            # equalize (processor sharing) instead of the parked stream
            # stalling. Swaps ride ONE fused group dispatch that exchanges
            # slot rows with lane rows, so they need no free lane — the
            # steady state they exist for (more streams than slots) is
            # exactly when every lane is occupied.
            swaps = 0
            for parked in urgent:
                if id(parked) in planned or swaps >= self.max_swaps_per_tick:
                    continue
                p_lead = self._lead(parked.handle, now) or 0.0
                best_b, best_lead = None, p_lead + self.swap_margin_s
                for b, slot in enumerate(self._slots):
                    if not slot.active or b in touched:
                        continue
                    lead = self._lead(slot.handle, now)
                    if lead is not None and lead > best_lead:
                        best_b, best_lead = b, lead
                if best_b is None:
                    continue
                plan_swap.append((parked, best_b, best_lead))
                planned.add(id(parked))
                touched.add(best_b)
                swaps += 1

        # Lanes still free after the planned swaps bound how many more
        # victims this tick may park for new admissions.
        preempt_budget = (
            len(self._free_lanes) - len(plan_park) if self.preempt else 0
        )

        admissible, deferred = [], []
        candidates = self._deferred
        self._deferred = []
        first = True
        while len(admissible) < len(free) + preempt_budget:
            if candidates:
                item = candidates.pop(0)
            else:
                try:
                    if first and block_seconds > 0 and not plan_resume:
                        item = self._pending.get(timeout=block_seconds)
                    else:
                        item = self._pending.get_nowait()
                except queue.Empty:
                    break
                first = False
            handle, voice, fae, max_gen, tokens = item
            if handle._cancelled.is_set():
                # Client gave up while queued: finish the handle for free.
                handle._chunks.clear()
                if not handle.done:
                    handle._queue.put(None)
                    handle._done.set()
                continue
            need = voice.written + self.text_pad + max_gen + 2 * self.segment_frames
            if need > self.capacity:
                # Oversized for the CURRENT cache: a submit() racing this
                # tick's _maybe_grow can be dequeued before the growth it
                # requested happens. Admitting it now would decode against
                # an under-sized cache (or crash splicing an oversized
                # voice row) — park it and retry after the next tick's
                # growth instead.
                with self._lock:
                    self._target_capacity = max(
                        self._target_capacity,
                        min(_bucket(need), self.max_capacity),
                    )
                deferred.append(item)
                continue
            admissible.append(item)

        # Plan victims for the shortfall; whatever still has no slot (no
        # victim had enough lead) waits on the deferred list for next tick.
        shortfall = min(len(admissible) - len(free), preempt_budget)
        if shortfall > 0:
            exclude = touched | {b for b, _ in plan_park}
            for b in self._pick_victims(shortfall, now, exclude):
                plan_park.append((b, self._lead(self._slots[b].handle, now)))
                free.append(b)
        overflow = []
        while len(admissible) > len(free):
            overflow.append(admissible.pop())
        overflow.reverse()
        self._deferred = deferred + overflow + candidates

        # ---- execute: group park -> group admit (+prefill) -> group swap
        # ---- -> group resume (slot/lane sets are disjoint across phases)
        if plan_park:
            self._execute_parks(plan_park)
        swapped_any = self._execute_swaps(plan_swap) if plan_swap else False

        admitted_any = False
        if admissible:
            to_admit = [
                (b, handle, voice, fae, max_gen, tokens)
                for b, (handle, voice, fae, max_gen, tokens) in zip(free, admissible)
            ]
            touched.update(b for b, *_ in to_admit)
            free = free[len(admissible) :]
            admitted = self._admit_group(to_admit)
            self._maybe_compact()
            self._prefill_admitted(admitted)
            admitted_any = True

        for parked in list(self._parked):
            if not free:
                break
            if id(parked) in planned:
                continue
            b = free.pop(0)
            plan_resume.append((parked, b))
            planned.add(id(parked))
            touched.add(b)
        resumed_any = self._execute_resumes(plan_resume) if plan_resume else False

        # Short-tick rate limit: the 2-frame post-admission segment + its
        # blocking immediate delivery buys cold-burst TTFA but costs ~4x
        # per-frame fixed overhead and a pipelining bubble; under sustained
        # churn (an admission nearly every tick) it must not become the
        # steady state. At most one short tick per 4 ticks.
        if admitted_any and self._ticks_since_short >= 4:
            self._just_admitted = True  # next tick runs the short segment
        return admitted_any or resumed_any or swapped_any

    def _retire_epoch(self, epoch: int) -> None:
        self._retired_epochs.add(epoch)
        if len(self._retired_epochs) > 4 * self.num_slots:
            horizon = self._epoch_counter - 2 * self.num_slots
            self._retired_epochs = {e for e in self._retired_epochs if e > horizon}

    def _dispatch_segment(self):
        """Enqueue one decode segment on the device; returns delivery handles.

        Under jax async dispatch this returns immediately — the returned
        device arrays are futures, so a caller may dispatch the next segment
        before fetching this one (see run()).
        """
        self._maybe_compact()
        # Host-side split: an eager accelerator split costs a dispatch
        # round-trip per tick (models/tts_model._split_key_cpu).
        from pocket_tts_tpu.models.tts_model import _split_key_cpu

        self._rng, rng = _split_key_cpu(self._rng)
        rng = np.asarray(rng)
        # Short tick right after an admission: newly admitted streams get
        # their first frames after first_segment_frames instead of a full
        # segment (TTFA under load).
        if self._just_admitted:
            seg_fn, frames = self._segment_short, self.first_segment_frames
            self._just_admitted = False
            self._ticks_since_short = 0
        else:
            seg_fn, frames = self._segment, self.segment_frames
            self._ticks_since_short += 1
        (
            self.flow_state,
            self.mimi_state,
            self.carry,
            audio,
            emit,
            _,
        ) = seg_fn(
            self.model.params,
            self.flow_state,
            self.mimi_state,
            self.carry,
            rng,
            jnp.float32(self.model.temp),
            jnp.float32(self.model.eos_threshold),
        )
        self._written += frames
        # Capture slot ownership at dispatch time: delivery must only touch
        # the (slot, handle, epoch) triples that were actually decoding in
        # THIS segment (a slot may be retired and re-admitted — even with the
        # same handle, for chunked requests — before delivery under
        # pipelining).
        rows = [
            (b, s.handle, s.epoch)
            for b, s in enumerate(self._slots)
            if s.active
        ]
        for b, _, _ in rows:
            self._pos[b] += frames

        # Active-slot-only audio fetch (see _gather_rows): at partial
        # occupancy, gather the active rows on device and transfer just
        # those — the audio bytes are the tick-wall floor through a
        # link-limited runtime. Full occupancy (and the mesh path, where a
        # host-index gather would insert collectives) fetches everything.
        K = max(8, -(-len(rows) // 8) * 8) if rows else self.num_slots
        gathered = K < self.num_slots and self.model.mesh is None
        if gathered:
            idxs = np.asarray(
                [b for b, _, _ in rows] + [rows[-1][0]] * (K - len(rows)), np.int32
            )
            audio, emit = self._gather_rows(audio, emit, idxs)
        # gathered: audio/emit row i belongs to rows[i]; else row index = slot.
        fetch_rows = rows if gathered else None

        # Snapshot the carry fields needed for delivery into fresh buffers:
        # the NEXT dispatch donates self.carry, which would delete these.
        eos_step, step, fae, max_gen = self._snapshot(self.carry)
        for dev_arr in (audio, emit, eos_step, step, fae, max_gen):
            dev_arr.copy_to_host_async()
        return (rows, fetch_rows, audio, emit, eos_step, step, fae, max_gen)

    def _deliver(self, dispatched) -> int:
        """Fetch a dispatched segment's outputs, push frames, retire slots."""
        rows, fetch_rows, audio, emit, eos_step_d, step_d, fae_d, max_gen_d = dispatched
        audio_np, emit_np, eos_step, step, fae_np, max_gen_np = jax.device_get(
            (audio, emit, eos_step_d, step_d, fae_d, max_gen_d)
        )
        for i, (b, handle, epoch) in enumerate(rows):
            # Audio/emit row: position i when the dispatch gathered active
            # rows, slot index b on the full-fetch path.
            r = i if fetch_rows is not None else b
            if epoch in self._retired_epochs:
                # Stale segment of an already-retired admission: for normal
                # completion its emit mask is False anyway; for cancellation
                # it may carry real frames that must NOT land after the None
                # terminator — drop the segment entirely.
                continue
            if handle._cancelled.is_set():
                self._retire_epoch(epoch)
                handle._chunks.clear()
                if not handle.done:
                    handle._queue.put(None)
                    handle._done.set()
                slot = self._slots[b]
                if slot.epoch == epoch:
                    slot.active = False
                    slot.handle = None
                    # silence the lane so the still-running decode emits nothing
                    self.carry = self._silence_lane(self.carry, jnp.int32(b))
                continue
            now = time.monotonic()
            for s in range(emit_np.shape[1]):  # short or full segment
                if emit_np[r, s]:
                    handle._queue.put(audio_np[r, s])
                    handle._frames_delivered += 1
                    if handle._first_frame_time is None:
                        handle._first_frame_time = now
                    if self.record_frame_times:
                        handle.frame_times.append(now)
            # Done when the reference loop would have exited
            # (step >= eos_step + frames_after_eos, capped by max_gen).
            steps_target = min(int(eos_step[b]) + int(fae_np[b]), int(max_gen_np[b]))
            if int(step[b]) >= steps_target:
                self._retire_epoch(epoch)
                if epoch in self._parked_by_epoch:
                    # The stream completed in the in-flight segment dispatched
                    # just before it was parked: its parked row is dead.
                    self._drop_parked(self._parked_by_epoch[epoch])
                if handle._chunks:
                    # More sentence chunks: requeue the next one (it restarts
                    # from the voice state, like the direct API's per-chunk
                    # copy_state=True). The handle stays open.
                    fae, max_gen, tokens = handle._chunks.pop(0)
                    self._pending.put((handle, handle._voice, fae, max_gen, tokens))
                else:
                    handle._queue.put(None)
                    handle._done.set()
                    self._record_completion()
                slot = self._slots[b]
                if slot.epoch == epoch:  # slot not yet re-admitted
                    slot.active = False
                    slot.handle = None
        return sum(s.active for s in self._slots)

    def step(self) -> int:
        """Admit, decode one segment, deliver its frames (synchronous tick)."""
        self._admit_pending()
        if not any(s.active for s in self._slots):
            return 0
        return self._deliver(self._dispatch_segment())

    def run(self, stop_when_idle: bool = True) -> None:
        """Pump the engine until all submitted work is done (or forever).

        Pipelined: segment k+1 is dispatched before segment k's outputs are
        fetched, overlapping device compute with device->host transfer and
        host-side frame delivery. Slot retirement lags one segment, so a slot
        becomes reusable one tick after its stream finishes — admission
        correctness is unaffected (admission rewrites the slot's rows).
        """
        in_flight = None
        idle_ticks = 0
        tick_t0 = None
        while True:
            fully_idle = in_flight is None and not any(s.active for s in self._slots)
            now = time.monotonic()
            if tick_t0 is not None and not fully_idle:
                self.tick_walls.append(now - tick_t0)
                if len(self.tick_walls) > 4096:
                    del self.tick_walls[:2048]
            tick_t0 = None if fully_idle else now
            self._admit_pending(block_seconds=0.05 if fully_idle else 0.0)
            short_tick = self._just_admitted  # consumed by _dispatch_segment
            any_active = any(s.active for s in self._slots)
            dispatched = self._dispatch_segment() if any_active else None
            if in_flight is not None:
                self._deliver(in_flight)
            if dispatched is not None and short_tick:
                # The tick right after an admission carries newly admitted
                # streams' FIRST frames: deliver it now instead of letting it
                # lag one pipelined tick — one blocking fetch shaves a full
                # tick off TTFA under load, at a one-tick pipelining pause.
                self._deliver(dispatched)
                dispatched = None
            in_flight = dispatched
            if (
                not any_active
                and in_flight is None
                and self._pending.empty()
                and not self._deferred
                and not self._parked
            ):
                idle_ticks += 1
                if stop_when_idle and idle_ticks > 1:
                    return
            else:
                idle_ticks = 0

    def frame_lateness(self, handle: RequestHandle, frame_seconds: float = 0.08):
        """Per-frame playback lateness for one completed stream.

        A client starts playback when frame 0 arrives; frame i must then be
        present by t0 + i*frame_seconds. Returns lateness[i] = arrival(i) -
        deadline(i) in seconds (positive = the player would have stalled with
        a zero-length buffer; a value below the client's buffer depth is
        safe). Requires record_frame_times=True."""
        times = handle.frame_times
        if not times:
            return np.zeros((0,), dtype=np.float64)
        t0 = times[0]
        deadlines = t0 + frame_seconds * np.arange(len(times))
        return np.asarray(times) - deadlines

    def serve_forever_in_thread(self) -> threading.Thread:
        """Run the engine loop on a daemon thread (for server frontends)."""
        thread = threading.Thread(target=self.run, kwargs={"stop_when_idle": False}, daemon=True)
        thread.start()
        return thread

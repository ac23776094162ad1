"""Audio I/O: file reading, PCM16 conversion, and pipe-friendly WAV streaming.

The streaming format contract comes from the reference consumer side
(reference: pocket_tts_mlx/data/audio.py): a WAV header is emitted BEFORE
any audio exists so a player on the other end of a pipe can start
immediately. Three quirks are deliberate behavior, not accidents:

  * the header advertises a huge placeholder frame count and is never
    patched on close (a pipe cannot be seeked back into);
  * the first ``FIRST_CHUNK_LENGTH_SECONDS`` of audio may be held back and
    released in one write, so players that probe the stream head do not see
    a truncated buffer;
  * 0.2 s of trailing silence pads the end, flushing player buffers.
"""

from __future__ import annotations

import logging
import os
import sys
import wave
from contextlib import nullcontext
from pathlib import Path
from typing import Any, Iterator

import numpy as np

logger = logging.getLogger(__name__)

# Hold back this many seconds of audio before the first PCM write reaches the
# output stream (0 = deliver every chunk immediately).
FIRST_CHUNK_LENGTH_SECONDS = float(os.environ.get("FIRST_CHUNK_LENGTH_SECONDS", "0"))

_PCM16_BYTES = 2
_TRAILING_SILENCE_SECONDS = 0.2
_STREAMING_FRAME_COUNT = 1_000_000_000  # placeholder; see module docstring


def pcm16_bytes(chunk: Any) -> bytes:
    """Flatten a chunk to mono int16 PCM bytes.

    Float input is taken as [-1, 1] and clip-scaled; int16 input (e.g. the
    serving engine's on-device conversion, serving/engine.py emit_pcm16)
    passes through untouched.
    """
    flat = np.asarray(chunk).reshape(-1)
    if flat.dtype != np.int16:
        flat = (np.clip(flat, -1.0, 1.0) * 32767).astype(np.int16)
    return flat.tobytes()


# ------------------------------------------------------------------- reading


def _downmix_to_mono(samples: np.ndarray, n_channels: int) -> np.ndarray:
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples


def audio_read(filepath: str | Path) -> tuple[np.ndarray, int]:
    """Read an audio file -> (float32 [1, T] in [-1, 1], sample_rate).

    ``.wav`` goes through the stdlib ``wave`` module so the common case needs
    no optional dependency; anything else requires ``soundfile``.
    """
    filepath = Path(filepath)
    if filepath.suffix.lower() == ".wav":
        return _read_wav_stdlib(filepath)
    return _read_via_soundfile(filepath)


def _read_wav_stdlib(filepath: Path) -> tuple[np.ndarray, int]:
    with wave.open(str(filepath), "rb") as f:
        rate = f.getframerate()
        channels = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(-1)
    if width != _PCM16_BYTES:
        raise ValueError(
            f"Only 16-bit WAV supported by the stdlib reader, got {8 * width}-bit"
        )
    mono = _downmix_to_mono(
        np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0, channels
    )
    return mono[None, :], rate


def _read_via_soundfile(filepath: Path) -> tuple[np.ndarray, int]:
    try:
        import soundfile as sf
    except ImportError as e:
        raise ImportError(
            "soundfile is required to read non-WAV audio files. "
            "Install with: pip install soundfile"
        ) from e
    data, rate = sf.read(str(filepath), dtype="float32")
    mono = data if data.ndim == 1 else data.mean(axis=1)
    return mono[None, :], rate


# ------------------------------------------------------------------- writing


def audio_write(filepath: str | Path, audio: np.ndarray, sample_rate: int) -> None:
    """Write a finished waveform as a seekable 16-bit PCM WAV (stdlib only)."""
    with wave.open(str(filepath), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(_PCM16_BYTES)
        f.setframerate(sample_rate)
        f.writeframes(pcm16_bytes(audio))


class StreamingWAVWriter:
    """Incremental PCM16 WAV emitter for pipes and sockets.

    Usage: ``write_header`` once, ``write_pcm_data`` per chunk, ``finalize``
    at the end. See the module docstring for the three streaming quirks this
    class implements.
    """

    def __init__(self, output_stream, sample_rate: int):
        self.output_stream = output_stream
        self.sample_rate = sample_rate
        self.wave_writer = None
        # Bytes withheld until the hold-back target is reached; None once
        # passthrough mode is entered.
        self._held: bytearray | None = bytearray()
        self._hold_target = (
            int(sample_rate * FIRST_CHUNK_LENGTH_SECONDS) * _PCM16_BYTES
        )

    def write_header(self, sample_rate: int) -> None:
        """Emit the streaming header (placeholder frame count) immediately."""
        self.wave_writer = wave.open(self.output_stream, "wb")
        self.wave_writer.setnchannels(1)
        self.wave_writer.setsampwidth(_PCM16_BYTES)
        self.wave_writer.setframerate(sample_rate)
        self.wave_writer.setnframes(_STREAMING_FRAME_COUNT)

    def write_pcm_data(self, audio_chunk: Any) -> None:
        """Append one chunk (float in [-1, 1] or ready int16 PCM)."""
        data = pcm16_bytes(audio_chunk)
        if self._held is None:
            self.wave_writer.writeframesraw(data)
            return
        self._held.extend(data)
        if len(self._held) >= self._hold_target:
            self._release_held()

    def _release_held(self) -> None:
        if self._held is not None:
            self.wave_writer.writeframesraw(bytes(self._held))
            self._held = None

    def finalize(self) -> None:
        """Release any held audio, pad with silence, close without seeking."""
        self._release_held()
        pad_samples = int(self.sample_rate * _TRAILING_SILENCE_SECONDS)
        self.wave_writer.writeframesraw(bytes(pad_samples * _PCM16_BYTES))
        # wave.close() normally seeks to offset 0 to fix up the frame count;
        # the stream may be a pipe, so the patch step is disabled and the
        # placeholder count stands.
        self.wave_writer._patchheader = lambda: None
        self.wave_writer.close()


def is_file_like(obj) -> bool:
    return all(hasattr(obj, attr) for attr in ("write", "close"))


def stream_audio_chunks(
    path: str | Path | None | Any, audio_chunks: Iterator[Any], sample_rate: int
) -> None:
    """Drain a chunk iterator into a streaming WAV sink.

    ``path`` may be a filesystem path, ``"-"`` for stdout, an open file-like
    object, or None (consume the iterator without writing — generation side
    effects still run).
    """
    if path == "-":
        sink = sys.stdout.buffer
    elif path is None:
        sink = nullcontext()
    elif is_file_like(path):
        sink = path
    else:
        sink = open(path, "wb")

    with sink:
        if path is None:
            for _ in audio_chunks:
                pass
            return
        writer = StreamingWAVWriter(sink, sample_rate)
        writer.write_header(sample_rate)
        for chunk in audio_chunks:
            writer.write_pcm_data(chunk)
        writer.finalize()

"""Audio I/O: file reading, streaming WAV output.

Behavior mirrors the reference (reference: pocket_tts_mlx/data/audio.py:18-130):
WAV files read via the stdlib `wave` module (int16 -> float32, downmix),
other formats via the optional `soundfile`; streaming output writes a
placeholder header so players can consume the pipe before generation ends,
buffering the first FIRST_CHUNK_LENGTH_SECONDS of audio to avoid truncated
starts, and finalizes with 0.2 s of silence.
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

FIRST_CHUNK_LENGTH_SECONDS = float(os.environ.get("FIRST_CHUNK_LENGTH_SECONDS", "0"))


def audio_read(filepath: str | Path) -> tuple[np.ndarray, int]:
    """Read an audio file -> (float32 [1, T] in [-1, 1], sample_rate)."""
    filepath = Path(filepath)

    if filepath.suffix.lower() == ".wav":
        with wave.open(str(filepath), "rb") as wav_file:
            sample_rate = wav_file.getframerate()
            n_channels = wav_file.getnchannels()
            sample_width = wav_file.getsampwidth()
            raw = wav_file.readframes(-1)
        if sample_width != 2:
            raise ValueError(f"Only 16-bit WAV supported by the stdlib reader, got {8*sample_width}-bit")
        samples = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        if n_channels > 1:
            samples = samples.reshape(-1, n_channels).mean(axis=1)
        return samples[None, :], sample_rate

    try:
        import soundfile as sf
    except ImportError as e:
        raise ImportError(
            "soundfile is required to read non-WAV audio files. "
            "Install with: pip install soundfile"
        ) from e

    data, sample_rate = sf.read(str(filepath), dtype="float32")
    wav = data[None, :] if data.ndim == 1 else data.mean(axis=1)[None, :]
    return wav, sample_rate


def audio_write(filepath: str | Path, audio: np.ndarray, sample_rate: int) -> None:
    """Write a 1-D float waveform as a 16-bit PCM WAV (stdlib only)."""
    audio = np.asarray(audio).reshape(-1)
    pcm = (np.clip(audio, -1.0, 1.0) * 32767).astype(np.int16)
    with wave.open(str(filepath), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


class StreamingWAVWriter:
    """Streaming WAV writer with optional initial buffering."""

    def __init__(self, output_stream, sample_rate: int):
        self.output_stream = output_stream
        self.sample_rate = sample_rate
        self.wave_writer = None
        self.first_chunk_buffer: list[bytes] | None = []

    def write_header(self, sample_rate: int) -> None:
        """Write a placeholder header (huge nframes) for streaming output."""
        self.wave_writer = wave.open(self.output_stream, "wb")
        self.wave_writer.setnchannels(1)
        self.wave_writer.setsampwidth(2)
        self.wave_writer.setframerate(sample_rate)
        self.wave_writer.setnframes(1_000_000_000)

    def write_pcm_data(self, audio_chunk: Any) -> None:
        """Append a chunk as int16 PCM, honoring first-chunk buffering.

        Accepts float arrays in [-1, 1] or pre-converted int16 PCM (e.g. from
        the engine's on-device conversion)."""
        chunk = np.asarray(audio_chunk).reshape(-1)
        if chunk.dtype == np.int16:
            chunk_bytes = chunk.tobytes()
        else:
            chunk_bytes = (np.clip(chunk, -1, 1) * 32767).astype(np.int16).tobytes()

        if self.first_chunk_buffer is not None:
            self.first_chunk_buffer.append(chunk_bytes)
            total = sum(len(c) for c in self.first_chunk_buffer)
            target = int(self.sample_rate * FIRST_CHUNK_LENGTH_SECONDS) * 2
            if total < target:
                return
            self._flush()
            return
        self.wave_writer.writeframesraw(chunk_bytes)

    def _flush(self) -> None:
        if self.first_chunk_buffer is not None:
            self.wave_writer.writeframesraw(b"".join(self.first_chunk_buffer))
            self.first_chunk_buffer = None

    def finalize(self) -> None:
        """Flush, append 0.2 s of silence, and close without patching the header."""
        self._flush()
        num_silence = int(self.sample_rate * 0.2)
        self.wave_writer.writeframesraw(bytes(num_silence * 2))
        if self.wave_writer:
            self.wave_writer._patchheader = lambda: None  # streaming: header stays
            self.wave_writer.close()


def is_file_like(obj) -> bool:
    return all(hasattr(obj, attr) for attr in ("write", "close"))


def stream_audio_chunks(
    path: str | Path | None | Any, audio_chunks: Iterator[Any], sample_rate: int
) -> None:
    """Pipe audio chunks as streaming PCM16 WAV to a path, '-' (stdout), or file."""
    if path == "-":
        f = sys.stdout.buffer
    elif path is None:
        f = nullcontext()
    elif is_file_like(path):
        f = path
    else:
        f = open(path, "wb")

    with f:
        writer = None
        if path is not None:
            writer = StreamingWAVWriter(f, sample_rate)
            writer.write_header(sample_rate)
        for chunk in audio_chunks:
            if writer is not None:
                writer.write_pcm_data(chunk)
        if writer is not None:
            writer.finalize()

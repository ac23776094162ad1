"""Audio I/O: streaming WAV writer semantics, chunk piping."""

import io
import wave

import numpy as np

from pocket_tts_tpu.data.audio import StreamingWAVWriter, audio_write, stream_audio_chunks


def test_streaming_writer_header_and_payload():
    buf = io.BytesIO()
    writer = StreamingWAVWriter(buf, 24000)
    writer.write_header(24000)
    chunk = np.linspace(-1, 1, 1920, dtype=np.float32)
    for _ in range(3):
        writer.write_pcm_data(chunk)
    writer.finalize()

    data = buf.getvalue()
    w = wave.open(io.BytesIO(data))
    assert w.getframerate() == 24000
    assert w.getnchannels() == 1
    assert w.getsampwidth() == 2
    # placeholder huge nframes (streaming header, never patched)
    assert w.getnframes() == 1_000_000_000
    # actual payload: 3 chunks + 0.2 s silence
    payload = len(data) - 44
    assert payload == (3 * 1920 + int(0.2 * 24000)) * 2


def test_streaming_writer_clips():
    buf = io.BytesIO()
    writer = StreamingWAVWriter(buf, 24000)
    writer.write_header(24000)
    writer.write_pcm_data(np.array([2.0, -2.0, 0.0], dtype=np.float32))
    writer.finalize()
    pcm = np.frombuffer(buf.getvalue()[44:50], dtype=np.int16)
    assert pcm[0] == 32767 and pcm[1] == -32767 and pcm[2] == 0


def test_stream_audio_chunks_to_path(tmp_path):
    path = tmp_path / "out.wav"
    chunks = [np.zeros(1920, dtype=np.float32) for _ in range(2)]
    stream_audio_chunks(path, iter(chunks), 24000)
    w = wave.open(str(path))
    assert w.getframerate() == 24000


def test_stream_audio_chunks_none_consumes():
    consumed = []

    def gen():
        for i in range(3):
            consumed.append(i)
            yield np.zeros(10, dtype=np.float32)

    stream_audio_chunks(None, gen(), 24000)
    assert consumed == [0, 1, 2]


def test_audio_write_roundtrip(tmp_path):
    path = tmp_path / "rt.wav"
    wav = np.sin(np.linspace(0, 20, 4800)).astype(np.float32) * 0.5
    audio_write(path, wav, 24000)
    from pocket_tts_tpu.data.audio import audio_read

    back, sr = audio_read(path)
    assert sr == 24000
    np.testing.assert_allclose(back[0], wav, atol=1e-4)

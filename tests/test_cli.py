"""End-to-end CLI test: `pocket-tts "text" -o out.wav` writes a valid WAV.

Runs the REAL console entry (pocket_tts_tpu/main.py — reference:
pocket_tts_mlx/main.py CLI surface) in-process against the full-size model
with random offline weights; the audio is noise but every pipeline stage
(load, voice state, prefill, segment decode, vocode, WAV write) executes.
"""

import sys
import wave


def test_cli_writes_wav(tmp_path, monkeypatch):
    from pocket_tts_tpu.main import main

    out = tmp_path / "out.wav"
    monkeypatch.setenv("POCKET_TTS_OFFLINE", "1")
    monkeypatch.setattr(
        sys, "argv", ["pocket-tts", "One two three four.", "-o", str(out)]
    )
    rc = main()
    assert rc == 0
    with wave.open(str(out)) as w:
        assert w.getframerate() == 24000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() > 0

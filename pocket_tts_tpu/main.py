"""Console entry point: synthesize one utterance to a WAV file.

The flag surface (names, defaults, short options) is API-pinned to the
reference CLI (reference: pocket_tts_mlx/main.py:21-44) — including the
max-tokens asymmetry: 500 here vs 50 for the Python API default
(default_parameters.MAX_TOKEN_PER_CHUNK).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

from pocket_tts_tpu import TTSModel
from pocket_tts_tpu.data.audio import audio_write

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Generate speech from text using pocket-tts with the TPU (JAX) backend"
    )
    p.add_argument("text", help="Text to convert to speech")
    p.add_argument("--voice", "-v", default="marius", help="Voice name (default: marius)")
    p.add_argument("--output", "-o", default="output.wav", help="Output WAV file")
    p.add_argument("--max-tokens", type=int, default=500, help="Max tokens per chunk")
    p.add_argument("--frames-after-eos", type=int, default=7, help="Frames after EOS")
    p.add_argument(
        "--trim-start-ms", type=int, default=0,
        help="Trim this many milliseconds from start of generated audio",
    )
    p.add_argument(
        "--fade-in-ms", type=int, default=0,
        help="Apply linear fade-in over this many milliseconds",
    )
    p.add_argument(
        "--warmup-frames", type=int, default=1,
        help="Number of initial Mimi frames to decode and discard for cleaner onset",
    )
    p.add_argument("--verbose", "-V", action="store_true", help="Verbose logging")
    return p


def synthesize_to_file(args: argparse.Namespace) -> Path:
    """Run the full pipeline for one request and return the written path."""
    logger.info("Loading model (JAX/TPU backend)...")
    model = TTSModel.load_model()

    logger.info("Preparing voice state '%s'...", args.voice)
    voice_state = model.get_state_for_audio_prompt(args.voice)

    logger.info("Synthesizing %d characters of text...", len(args.text))
    audio = model.generate_audio(
        model_state=voice_state,
        text_to_generate=args.text,
        max_tokens=args.max_tokens,
        frames_after_eos=args.frames_after_eos,
        trim_start_ms=args.trim_start_ms,
        fade_in_ms=args.fade_in_ms,
        warmup_frames=args.warmup_frames,
    )

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    sample_rate = model.config.mimi.sample_rate
    audio_write(out, audio, sample_rate)
    logger.info("Wrote %s (%.2fs)", out, audio.shape[-1] / sample_rate)
    return out


def main() -> int:
    args = build_parser().parse_args()
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(message)s",
    )
    try:
        synthesize_to_file(args)
    except Exception as exc:  # noqa: BLE001 — the CLI reports, not raises
        logger.error("Error: %s", exc)
        if args.verbose:
            logger.exception("Traceback:")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

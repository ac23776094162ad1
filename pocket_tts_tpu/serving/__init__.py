from pocket_tts_tpu.serving.engine import RequestHandle, TTSEngine

__all__ = ["TTSEngine", "RequestHandle"]

from pocket_tts_tpu.models.tts_model import TTSModel

__all__ = ["TTSModel"]

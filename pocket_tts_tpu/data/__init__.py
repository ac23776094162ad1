from pocket_tts_tpu.data.audio import StreamingWAVWriter, audio_read, stream_audio_chunks
from pocket_tts_tpu.data.audio_utils import convert_audio

__all__ = ["StreamingWAVWriter", "audio_read", "stream_audio_chunks", "convert_audio"]

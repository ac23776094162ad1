from pocket_tts_tpu.conditioners.text import (
    BaseConditioner,
    LUTConditioner,
    SentencePieceTokenizer,
    TokenizedText,
)

__all__ = ["BaseConditioner", "TokenizedText", "LUTConditioner", "SentencePieceTokenizer"]

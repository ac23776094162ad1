"""pocket-tts-tpu: TPU-native JAX inference stack for pocket-tts.

Public API mirrors the reference package `pocket_tts_mlx`
(reference: pocket_tts_mlx/__init__.py:1-7).
"""

__version__ = "0.5.0"

from pocket_tts_tpu.models.tts_model import TTSModel

__all__ = ["TTSModel", "__version__"]

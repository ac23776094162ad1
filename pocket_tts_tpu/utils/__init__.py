from pocket_tts_tpu.utils.assets import download_if_necessary, make_cache_directory
from pocket_tts_tpu.utils.safetensors import load_safetensors, save_safetensors
from pocket_tts_tpu.utils.timing import display_execution_time, size_of_pytree

__all__ = [
    "download_if_necessary",
    "make_cache_directory",
    "load_safetensors",
    "save_safetensors",
    "display_execution_time",
    "size_of_pytree",
]
